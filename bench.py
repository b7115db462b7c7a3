"""Benchmark: Whitted wavefront render throughput on the reference's
"shadows" scene (BASELINE.json config 1: 256x256, max depth 5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Ray accounting: every wavefront level traces, per queue lane, one
closest-hit ray plus one any-hit shadow ray per light; the queue capacity
equals the pixel-sample count. The reference publishes no numbers
(BASELINE.md), so vs_baseline is reported against the driver's north-star
target of 100 Mrays/s/chip.
"""
from __future__ import annotations

import json
import time

import numpy as np
import jax

RES = 256
SPP = 4
MAX_DEPTH = 5
NORTH_STAR_MRAYS = 100.0


def main():
    from trace_tpu.models.spheres import build_scene, build_camera
    from trace_tpu.integrators.whitted import WhittedIntegrator
    from trace_tpu.sampler.uniform import UniformSampler

    scene = build_scene()
    camera = build_camera(resolution=RES, filename="/tmp/bench_shadows.png")
    integ = WhittedIntegrator(
        camera, UniformSampler(SPP, seed=0), max_depth=MAX_DEPTH,
        pixel_chunk=1 << 17,  # whole frame in one chunk -> spp dispatches
    )

    # Warm-up (compile).
    state = integ.render(scene)
    jax.block_until_ready(state.xyz)

    runs = 3
    t0 = time.perf_counter()
    for _ in range(runs):
        state = integ.render(scene)
        jax.block_until_ready(state.xyz)
    dt = (time.perf_counter() - t0) / runs

    (x0, y0), (x1, y1) = camera.film.sample_bounds()
    n_pixels = (x1 - x0 + 1) * (y1 - y0 + 1)
    n_lights = int(np.asarray(scene.lights.kind).shape[0])
    rays_per_level = n_pixels * SPP * (1 + n_lights)
    total_rays = rays_per_level * MAX_DEPTH
    mrays = total_rays / dt / 1e6

    print(json.dumps({
        "metric": "whitted_shadows_256_mrays_per_sec",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
