"""Frame attribution: where do bench config 1's 168 ms go?

micro_planar.py measured the planar li at 5.4 ms per 65536-lane chunk
(half-caps schedule), so a 4-spp 256² frame should be ~25 ms — bench
measured 168. This probe times the frame's other pieces the same
k-differenced way: camera ray-gen, identity-keyed PRNG, film
add_samples, and the full production _sample_body / _chunk_pass.
Cumulative JSON per probe.
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

F32 = jnp.float32


def _force(x):
    return np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[0])


def diff_time(run_k, k_lo, k_hi, reps=3):
    run_k(k_lo)
    ds = [(run_k(k_hi) - run_k(k_lo)) / (k_hi - k_lo) for _ in range(reps)]
    return float(np.median(ds))


def timed_step(step, state0, k_lo=2, k_hi=10, reps=3):
    def loop(k, s):
        return jax.lax.fori_loop(
            0, k, lambda i, c: step(jnp.float32(i) * 1e-30, c), s)
    jl = jax.jit(loop)

    def run_k(k):
        t0 = time.perf_counter()
        o = jl(jnp.int32(k), state0)
        _force(o)
        return time.perf_counter() - t0
    return diff_time(run_k, k_lo, k_hi, reps)


def main():
    out = {}

    def emit():
        print(json.dumps(out), flush=True)

    from trace_tpu.models.spheres import build_scene, build_camera
    from trace_tpu.sampler import uniform as U
    from trace_tpu.integrators.whitted import WhittedIntegrator
    from trace_tpu.sampler.uniform import UniformSampler

    res, spp, max_depth = 256, 4, 5
    scene = build_scene()
    camera = build_camera(resolution=res, filename="/tmp/microf.png")
    integ = WhittedIntegrator(
        camera, UniformSampler(spp, seed=0), max_depth=max_depth,
        pixel_chunk=1 << 17, level_caps=(1.0, 0.5, 0.5, 0.5),
    )
    film = camera.film
    pixels = jnp.asarray(integ._pixel_grid())
    n = int(pixels.shape[0])
    out["n_lanes"] = n
    valid = jnp.ones((n,), bool)
    key = jax.random.key(0)

    # --- camera ray-gen + PRNG (the pre-li part of _sample_body) --------
    def pre_li(salt, carry):
        acc, = carry
        ks = U.lane_keys(jax.random.fold_in(key, 0), U.pixel_ids(pixels))
        p_film, u_lens, u_time = U.get_camera_samples_lanes(
            U.fold_lanes(ks, 0), pixels)
        p_film = p_film + salt
        rd, weight = camera.generate_ray_differentials(
            p_film, u_lens, u_time)
        return (acc + jnp.sum(rd.d) * 1e-30,)

    out["pre_li_ms"] = round(
        timed_step(pre_li, (jnp.float32(0.0),)) * 1e3, 3)
    emit()

    # --- film add_samples alone ----------------------------------------
    ks = U.lane_keys(key, U.pixel_ids(pixels))
    p_film0, u_lens0, u_time0 = U.get_camera_samples_lanes(
        U.fold_lanes(ks, 0), pixels)
    l_fake = jnp.abs(jnp.sin(p_film0[:, :1] * jnp.ones((1, 3))))

    def film_step(salt, carry):
        state, = carry
        state = film.add_samples(state, p_film0 + salt, l_fake + salt,
                                 jnp.ones((n,), F32), valid=valid)
        return (state,)

    out["film_add_ms"] = round(
        timed_step(film_step, (film.initial_state(),)) * 1e3, 3)
    emit()

    # --- full production _sample_body (1 spp) ---------------------------
    def sample_body(salt, carry):
        state, aux = carry
        lo = jnp.zeros(2, F32) + salt
        scale = jnp.ones(2, F32)
        return integ._sample_body(scene, (state, aux),
                                  pixels, valid,
                                  jax.random.fold_in(key, 1), lo, scale)

    aux0 = {"queue_drops": jnp.zeros((), jnp.int32),
            "useful_rays": jnp.zeros((), jnp.int32)}
    out["sample_body_ms"] = round(
        timed_step(sample_body, (film.initial_state(), aux0),
                   k_lo=1, k_hi=5) * 1e3, 3)
    emit()

    # --- full production frame (all spp), the bench's exact timer ------
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    run_k = bench._frame_exec_timer(integ, scene)
    out["frame_ms"] = round(bench._diff_time(run_k, 2, 6) * 1e3, 3)
    emit()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
