"""Wavefront-BVH walk vs the dense sweeps, execution-honest, on real
meshes: the 1M-tri heightfield (BASELINE config 4) and the 88k-tri
caustic glass (config 3's traversal load).

Per ARCHITECTURE §7e the sweeps pay dense per-(ray, entered-super) work
(~150k triangle tests/ray at 1M tris); the wbvh walk does per-ray
data-dependent work (~100 tests). This probe records closest-hit and
any-hit ms per 16384 rays for the scene's default accelerator and the
wbvh walk. Rays are STRIDED over the full raster (every (H*W/N)-th
pixel) — a contiguous block would cover only the top rows, which on the
heightfield is mostly sky and measures a near-empty traversal.

Timing: k-differenced in-jit fori chains, forced by reading the chain's
OWN scalar result. Forcing a pass-through/loop-invariant output lets
the relay (and XLA's dead-carry elimination) return without executing
the chain — observed as a 190x "speedup" in this probe's first version.
Hit fractions are printed from the same arrays as a sanity check that
the timed work is the real workload.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _force, _warm_d2h, _diff_time  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-axon")

N = 16384
out = {}


def emit():
    print(json.dumps(out), flush=True)


def camera_rays(camera, res):
    from trace_tpu.sampler import uniform as U

    stride = max((res * res) // N, 1)
    lin = np.arange(N, dtype=np.int64) * stride
    xs = np.stack([(lin % res).astype(np.int32) + 1,
                   (lin // res % res).astype(np.int32) + 1], -1)
    pf, ul, ut = U.get_camera_samples(jax.random.key(1), jnp.asarray(xs))
    rd, _ = camera.generate_ray_differentials(pf, ul, ut)
    return np.asarray(rd.o), np.asarray(rd.d)


def timed(fn, o, d, k_lo=1, k_hi=3, reps=2):
    tmax = jnp.full((o.shape[0],), jnp.inf, jnp.float32)
    ob = jnp.asarray(o)
    db = jnp.asarray(d)

    def loop(k, s0):
        def it(i, s):
            h, t, idx = fn(ob + s, db, tmax)
            return (jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))
                    + jnp.sum(idx.astype(jnp.float32))) * jnp.float32(1e-30)
        return jax.lax.fori_loop(0, k, it, s0)

    jl = jax.jit(loop)

    def run_k(k):
        t0 = time.perf_counter()
        s = jl(jnp.int32(k), jnp.float32(0.0))
        np.asarray(s)  # the chain's own result — see module docstring
        return time.perf_counter() - t0

    return _diff_time(run_k, k_lo, k_hi, reps) * 1e3


def hit_frac(fn, o, d):
    tmax = jnp.full((o.shape[0],), jnp.inf, jnp.float32)
    h, t, _ = fn(jnp.asarray(o), jnp.asarray(d), tmax)
    return round(float(np.asarray(h).mean()), 4)


def acc_fn(scene, acc, any_hit):
    if hasattr(acc, "_chunked"):
        return lambda oo, dd, tt: acc._chunked(oo, dd, tt, any_hit)
    if any_hit:
        def f(oo, dd, tt):
            occ = acc.any_hit(scene, oo, dd, tt)
            return occ, tt, jnp.zeros_like(tt, jnp.int32)
        return f
    return lambda oo, dd, tt: acc.closest(scene, oo, dd, tt)[1]


def probe(tag, scene, camera, res, sweep_too=True):
    from trace_tpu.accel import wbvh

    o, d = camera_rays(camera, res)
    default_acc = scene.accel
    out[f"{tag}_default_accel"] = type(default_acc).__name__

    # -- wbvh walk first (the decision variable) ------------------------
    wbvh.attach(scene)
    wacc = scene.accel
    out[f"{tag}_wbvh_stack_depth"] = wacc.stack_depth
    out[f"{tag}_wbvh_hit_frac"] = hit_frac(acc_fn(scene, wacc, False), o, d)
    out[f"{tag}_wbvh_closest_ms"] = round(
        timed(acc_fn(scene, wacc, False), o, d), 1)
    emit()
    out[f"{tag}_wbvh_anyhit_ms"] = round(
        timed(acc_fn(scene, wacc, True), o, d), 1)
    emit()

    # -- default accelerator (sweep) ------------------------------------
    scene.accel = default_acc
    scene.bump_version()
    if sweep_too:
        out[f"{tag}_sweep_hit_frac"] = hit_frac(
            acc_fn(scene, default_acc, False), o, d)
        out[f"{tag}_sweep_closest_ms"] = round(
            timed(acc_fn(scene, default_acc, False), o, d), 1)
        emit()


def main():
    _warm_d2h()
    out["backend"] = jax.default_backend()

    from trace_tpu.models.mesh_heavy import build_scene as mh_scene
    from trace_tpu.models.mesh_heavy import build_camera as mh_cam

    scene = mh_scene()
    probe("mesh1m", scene, mh_cam(resolution=256, filename="/tmp/mw.png"),
          256)

    from trace_tpu.models.caustic_glass import build_scene as cg_scene
    from trace_tpu.models.caustic_glass import build_camera as cg_cam

    sc2 = cg_scene()
    probe("caustic88k", sc2,
          cg_cam(resolution=256, filename="/tmp/cw.png"), 256)


if __name__ == "__main__":
    main()
