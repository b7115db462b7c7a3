"""Production li A/B: packed (integrators/whitted.li) vs planar
(wavefront/whitted.li) on the shadows scene at bench shapes.

k-differenced in-jit timing with forced readback (the only honest
timing through the axon relay — bench.py top comment). Also probes the
planar level-caps schedule (queue shrink after level 1) and depth
scaling. Cumulative JSON after every probe.
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
    from trace_tpu.integrators import whitted as packed_w
    from trace_tpu.wavefront import whitted as planar_w
    from trace_tpu.utils.pytree import replace

    scene = build_scene()
    camera = build_camera(resolution=256, filename="/tmp/microp.png")
    xs = np.stack([np.arange(N, dtype=np.int32) % 256,
                   np.arange(N, dtype=np.int32) // 256], -1)
    pf, ul, ut = U.get_camera_samples(jax.random.key(1), jnp.asarray(xs))
    rd0, _ = camera.generate_ray_differentials(pf, ul, ut)
    keys0 = U.lane_keys(jax.random.key(2), U.pixel_ids(jnp.asarray(xs)))

    def timed_li(li_fn, k_lo=1, k_hi=4, reps=3):
        def loop(k, carry):
            def it(i, c):
                r, s = c
                r2 = replace(r, o=r.o + s)
                lv = li_fn(r2)
                return (r, jnp.sum(lv) * jnp.float32(1e-30))
            return jax.lax.fori_loop(0, k, it, carry)

        jl = jax.jit(loop)

        def run_k(k):
            t0 = time.perf_counter()
            o = jl(jnp.int32(k), (rd0, jnp.float32(0.0)))
            _force(o)
            return time.perf_counter() - t0

        return diff_time(run_k, k_lo, k_hi, reps)

    out["packed_li_d5_ms"] = round(timed_li(
        lambda r: packed_w.li(scene, r, keys0, 5)) * 1e3, 3)
    emit()
    out["planar_li_d5_ms"] = round(timed_li(
        lambda r: planar_w.li(scene, r, keys0, 5)) * 1e3, 3)
    emit()
    for d in (1, 2, 3):
        out[f"planar_li_d{d}_ms"] = round(timed_li(
            lambda r, d=d: planar_w.li(scene, r, keys0, d)) * 1e3, 3)
        emit()
    # Queue-shrink schedules (drops checked separately on CPU/tests).
    for name, caps in (
        ("half", (N, N // 2, N // 2, N // 2)),
        ("quarter", (N, N // 2, N // 4, N // 4)),
    ):
        out[f"planar_caps_{name}_ms"] = round(timed_li(
            lambda r, caps=caps: planar_w.li(
                scene, r, keys0, 5, level_caps=caps)) * 1e3, 3)
        emit()
        # Drops under this schedule (device count, one readback).
        _, aux = planar_w.li(scene, rd0, keys0, 5, level_caps=caps,
                             return_aux=True)
        out[f"planar_caps_{name}_drops"] = int(aux["queue_drops"])
        emit()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
