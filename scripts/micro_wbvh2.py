"""wbvh tuning probe (mesh1m): step counts + ms for leaf/chunk/sort
variants, vs the default sweep — rays passed as jit ARGS so each
accelerator compiles once and every ray set reuses the executable
(micro_wbvh.py baked rays in as constants: one cold compile per
variant ate the budget).

Reports, per variant: worst-lane step count (the while_loop's iteration
count — the whole batch pays it) and k-differenced ms per 16384
full-raster strided camera rays.
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

from bench import _warm_d2h, _diff_time  # noqa: E402

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


def make_timer(fn):
    """fn(o, d, tmax) -> (h, t, idx); returns run(o, d) -> unit ms with
    rays as traced args (one executable for all ray sets)."""
    def loop(k, ob, db, s0):
        tmax = jnp.full((ob.shape[0],), jnp.inf, jnp.float32)

        def it(i, s):
            h, t, idx = fn(ob + s, db, tmax)
            return (jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))
                    + jnp.sum(idx.astype(jnp.float32))) * jnp.float32(1e-30)
        return jax.lax.fori_loop(0, k, it, s0)

    jl = jax.jit(loop, static_argnums=())

    def run(o, d, k_lo=1, k_hi=3, reps=2):
        ob, db = jnp.asarray(o), jnp.asarray(d)

        def run_k(k):
            t0 = time.perf_counter()
            s = jl(jnp.int32(k), ob, db, jnp.float32(0.0))
            np.asarray(s)  # force the chain's own result
            return time.perf_counter() - t0

        return _diff_time(run_k, k_lo, k_hi, reps) * 1e3

    return run


def main():
    _warm_d2h()
    out["backend"] = jax.default_backend()

    from trace_tpu.models.mesh_heavy import build_scene as mh_scene
    from trace_tpu.models.mesh_heavy import build_camera as mh_cam
    from trace_tpu.accel import wbvh

    scene = mh_scene()
    sweep = scene.accel
    o, d = camera_rays(
        scene and mh_cam(resolution=256, filename="/tmp/m2.png"), 256)

    # -- sweep on the same rays (args-passed: one compile) --------------
    sweep_fn = lambda oo, dd, tt: sweep.closest(scene, oo, dd, tt)[1]
    t_sweep = make_timer(sweep_fn)
    out["sweep_closest_ms"] = round(t_sweep(o, d), 1)
    emit()

    # -- wbvh variants ---------------------------------------------------
    for leaf in (4, 8):
        wbvh.attach(scene, max_prims_per_leaf=leaf)
        acc = scene.accel
        tag = f"wbvh_l{leaf}"
        out[f"{tag}_stack"] = acc.stack_depth

        # Worst-lane steps: whole batch unsorted, and sorted 4096-chunks.
        steps_fn = jax.jit(lambda ob, db: wbvh.traverse_batch(
            acc.nodes_mat, acc.tris_mat, ob, db,
            jnp.full((ob.shape[0],), jnp.inf, jnp.float32),
            max_leaf=leaf, stack_depth=acc.stack_depth,
            return_steps=True)[3])
        out[f"{tag}_steps_unsorted"] = int(steps_fn(
            jnp.asarray(o), jnp.asarray(d)))
        from trace_tpu.accel.clusters import _sort_key
        key = np.asarray(_sort_key(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(acc._world_lo),
            jnp.asarray(acc._world_inv_extent)))
        order = np.argsort(key)
        os_, ds_ = o[order], d[order]
        chunk_steps = [int(steps_fn(jnp.asarray(os_[s:s + 4096]),
                                    jnp.asarray(ds_[s:s + 4096])))
                       for s in range(0, N, 4096)]
        out[f"{tag}_steps_sorted_4k"] = chunk_steps
        emit()

        # Timed: accelerator path (sorted, chunk 4096) with args-passed
        # rays.
        acc.ray_chunk = 4096
        acc.sort_rays = True
        t_acc = make_timer(
            lambda oo, dd, tt, acc=acc: acc._chunked(oo, dd, tt, False))
        out[f"{tag}_sorted4k_closest_ms"] = round(t_acc(o, d), 1)
        emit()

    scene.accel = sweep
    scene.bump_version()


if __name__ == "__main__":
    main()
