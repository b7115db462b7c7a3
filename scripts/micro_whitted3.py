"""Third-level attribution: leave-one-out deltas on a reimplemented
Whitted level loop.

micro_whitted2.py showed every isolated piece costs <2 ms while the
full li() is 177 ms — the cost must come from composition. This script
rebuilds the depth loop from the SAME pieces with per-piece toggles and
times: depth scaling (1/2/3/5) and leave-one-out variants at depth 5.
Cumulative JSON line after every measurement.
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

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-axon")

N = 65536
F32 = jnp.float32


def _force(x):
    return np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[0])


def diff_time(run_k, k_lo, k_hi, reps=3):
    run_k(k_lo)
    ds = [(run_k(k_hi) - run_k(k_lo)) / (k_hi - k_lo) for _ in range(reps)]
    return float(np.median(ds))


def main():
    out = {}

    def emit():
        print(json.dumps(out), flush=True)

    from trace_tpu.models.spheres import build_scene, build_camera
    from trace_tpu.sampler import uniform as U
    from trace_tpu.integrators import common
    from trace_tpu.core.interaction import compute_differentials
    from trace_tpu.materials.materials import compute_scattering
    from trace_tpu.bxdf import lobes as lb
    from trace_tpu.utils.pytree import replace
    from trace_tpu.integrators.whitted import _sample_specular, _compact

    scene = build_scene()
    camera = build_camera(resolution=256, filename="/tmp/micro3.png")
    xs = np.stack([np.arange(N, dtype=np.int32) % 256,
                   np.arange(N, dtype=np.int32) // 256], -1)
    pf, ul, ut = U.get_camera_samples(jax.random.key(1), jnp.asarray(xs))
    rd0, _ = camera.generate_ray_differentials(pf, ul, ut)
    keys0 = U.lane_keys(jax.random.key(2), U.pixel_ids(jnp.asarray(xs)))
    n_lights = int(np.asarray(scene.lights.kind).shape[0])

    def make_li(max_depth, *, use_diffs=True, use_scatter_lobes=True,
                use_direct=True, use_spec=True, use_compact=True,
                use_lbuf=True):
        def li_fn(rd, key_sc):
            n = rd.o.shape[0]
            queue = dict(
                rd=rd, beta=jnp.ones((n, 3), F32),
                slot=jnp.arange(n, dtype=jnp.int32),
                path=jnp.zeros((n,), jnp.uint32),
                active=jnp.ones((n,), bool),
            )
            cap = n

            def body(depth, carry):
                l_buf, queue = carry
                k_depth = U.fold_lanes(
                    U.fold_lanes(keys0[queue["slot"]], queue["path"]),
                    depth)
                q_rd = queue["rd"]
                hit = scene.intersect(q_rd.o, q_rd.d, q_rd.t_max, q_rd.time)
                valid = queue["active"] & hit.valid
                hit = replace(hit, valid=valid)
                if use_diffs:
                    hit = compute_differentials(hit, q_rd)
                if use_scatter_lobes:
                    lobes = compute_scattering(
                        scene.materials, hit,
                        allow_multiple_lobes=False, mode=lb.RADIANCE)
                else:
                    from trace_tpu.bxdf import bsdf as B
                    lobes = B.from_hit(hit)
                contrib = scene.area_light_radiance(hit, hit.wo)
                if use_direct:
                    contrib = contrib + common.sum_over_lights(
                        scene, hit, lobes, U.fold_lanes(k_depth, 0))
                contrib = common.sanitize_radiance(queue["beta"] * contrib)
                if use_lbuf:
                    l_buf = l_buf.at[queue["slot"]].add(
                        jnp.where(valid[..., None], contrib, 0.0))
                else:
                    l_buf = l_buf + contrib * 1e-9
                if use_spec:
                    spawn = valid & (depth < max_depth)
                    children = []
                    for branch, flags in enumerate(
                        (lb.BSDF_SPECULAR | lb.BSDF_REFLECTION,
                         lb.BSDF_SPECULAR | lb.BSDF_TRANSMISSION)):
                        child_rd, factor, ok = _sample_specular(
                            scene, hit, lobes, q_rd, spawn,
                            U.fold_lanes(k_depth, branch + 1), flags)
                        children.append(dict(
                            rd=child_rd,
                            beta=jnp.where(ok[..., None],
                                           queue["beta"] * factor, 0.0),
                            slot=queue["slot"],
                            path=queue["path"] * jnp.uint32(2)
                            + jnp.uint32(branch + 1),
                            active=ok,
                        ))
                    allc = jax.tree.map(
                        lambda *xsv: jnp.concatenate(xsv, axis=0),
                        *children)
                    if use_compact:
                        queue = _compact(allc, cap)
                    else:
                        queue = jax.tree.map(lambda x: x[:cap], allc)
                return l_buf, queue

            l_buf0 = jnp.zeros((n, 3), F32)
            l_buf, _ = jax.lax.fori_loop(
                1, max_depth + 1, body, (l_buf0, queue))
            return l_buf

        return li_fn

    def timed_li(li_fn, k_lo=1, k_hi=4, reps=3):
        def loop(k, carry):
            def it(i, c):
                r, s = c
                r2 = replace(r, o=r.o + s)
                lv = li_fn(r2, s)
                return (r, jnp.sum(lv) * jnp.float32(1e-30))
            return jax.lax.fori_loop(0, k, it, carry)

        jl = jax.jit(loop)

        def run_k(k):
            t0 = time.perf_counter()
            o = jl(jnp.int32(k), (rd0, jnp.float32(0.0)))
            _force(o)
            return time.perf_counter() - t0

        return diff_time(run_k, k_lo, k_hi, reps)

    # Depth scaling
    for d in (1, 2, 3, 5):
        out[f"li_depth{d}_ms"] = round(timed_li(make_li(d)) * 1e3, 3)
        emit()

    # Leave-one-out at depth 5
    for name, kw in (
        ("no_diffs", dict(use_diffs=False)),
        ("no_lobes", dict(use_scatter_lobes=False)),
        ("no_direct", dict(use_direct=False)),
        ("no_spec", dict(use_spec=False)),
        ("no_compact", dict(use_compact=False)),
        ("no_lbuf", dict(use_lbuf=False)),
    ):
        out[f"li_d5_{name}_ms"] = round(
            timed_li(make_li(5, **kw)) * 1e3, 3)
        emit()

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
