"""Second-level attribution: pieces of the Whitted per-depth body.

micro_whitted.py bounded the frame at 177 ms/spp-level-set with
intersect/compact/scatter accounting for only ~25 ms — this script times
the remaining body pieces (PRNG, differentials, material lobes, direct
lighting, specular sampling) at the same 65536-lane chunk shape.
Prints a cumulative JSON line after every probe.
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


def _force(x):
    return np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[0])


def diff_time(run_k, k_lo, k_hi, reps=3):
    run_k(k_lo)
    ds = [(run_k(k_hi) - run_k(k_lo)) / (k_hi - k_lo) for _ in range(reps)]
    return float(np.median(ds))


def timed_loop(step, state0, k_lo=2, k_hi=10, reps=3):
    def loop(k, s):
        return jax.lax.fori_loop(0, k, lambda i, c: step(c), s)

    jl = jax.jit(loop)

    def run_k(k):
        t0 = time.perf_counter()
        out = jl(jnp.int32(k), state0)
        _force(out)
        return time.perf_counter() - t0

    return diff_time(run_k, k_lo, k_hi, reps)


def main():
    out = {}

    def emit():
        print(json.dumps(out), flush=True)

    from trace_tpu.models.spheres import build_scene, build_camera
    from trace_tpu.sampler.uniform import (get_camera_samples, lane_keys,
                                           fold_lanes, uniform_lanes,
                                           pixel_ids)
    from trace_tpu.integrators import common
    from trace_tpu.core.interaction import compute_differentials
    from trace_tpu.materials.materials import compute_scattering
    from trace_tpu.bxdf import lobes as lb
    from trace_tpu.bxdf import bsdf as B
    from trace_tpu.utils.pytree import replace
    from trace_tpu.integrators.whitted import _sample_specular

    scene = build_scene()
    camera = build_camera(resolution=256, filename="/tmp/micro2.png")
    xs = np.stack([np.arange(N, dtype=np.int32) % 256,
                   np.arange(N, dtype=np.int32) // 256], -1)
    pf, ul, ut = get_camera_samples(jax.random.key(1), jnp.asarray(xs))
    rd, _ = camera.generate_ray_differentials(pf, ul, ut)
    hit0 = jax.jit(lambda r: scene.intersect(r.o, r.d, r.t_max, r.time))(rd)
    hit0 = jax.block_until_ready(hit0)
    keys0 = lane_keys(jax.random.key(2), pixel_ids(jnp.asarray(xs)))

    def probe(name, piece, state_extra=None, k_lo=2, k_hi=10):
        # step perturbs the hit through the carried scalar so the piece
        # cannot be hoisted out of the loop (LICM), then folds the
        # output back into the scalar.
        def step(carry):
            h, s = carry
            h2 = replace(h, p=h.p + s * 0.0, valid=h.valid)
            r = piece(h2)
            return (h, jnp.sum(jax.tree.leaves(r)[0]) * jnp.float32(1e-30))

        try:
            out[name] = round(
                timed_loop(step, (hit0, jnp.float32(0.0)),
                           k_lo=k_lo, k_hi=k_hi) * 1e3, 3)
        except Exception as e:  # record and continue
            out[name] = f"error: {type(e).__name__}"
        emit()

    # 1. PRNG: per-lane fold + 2D uniforms, 3 streams (one depth level's
    # draw budget: lights x1 + two specular branches).
    def prng(h):
        tot = 0.0
        for b in range(3):
            u = uniform_lanes(fold_lanes(keys0, b), 2)
            tot = tot + jnp.sum(u) * (1.0 + jnp.sum(h.p) * 0.0)
        return tot

    probe("prng_3x2d_ms", prng)

    # 2. ray differentials transfer
    probe("compute_differentials_ms", lambda h: compute_differentials(h, rd))

    # 3. material -> lobe table
    probe("compute_scattering_ms",
          lambda h: compute_scattering(scene.materials, h,
                                       allow_multiple_lobes=False,
                                       mode=lb.RADIANCE))

    hit_d = jax.jit(lambda h: compute_differentials(h, rd))(hit0)
    hit_d = jax.block_until_ready(hit_d)
    lobes0 = jax.jit(lambda h: compute_scattering(
        scene.materials, h, allow_multiple_lobes=False,
        mode=lb.RADIANCE))(hit_d)
    lobes0 = jax.block_until_ready(lobes0)

    # 4. direct lighting over the scene's lights (BSDF eval + shadow rays)
    def direct(h):
        return common.sum_over_lights(scene, h, lobes0, keys0)

    probe("sum_over_lights_ms", direct)

    # 5. area-light radiance lookup
    probe("area_light_radiance_ms",
          lambda h: scene.area_light_radiance(h, h.wo))

    # 6. two specular branch samples (reflect + transmit)
    def spec2(h):
        tot = 0.0
        for branch, flags in enumerate(
            (lb.BSDF_SPECULAR | lb.BSDF_REFLECTION,
             lb.BSDF_SPECULAR | lb.BSDF_TRANSMISSION)):
            child, factor, ok = _sample_specular(
                scene, h, lobes0, rd, h.valid,
                fold_lanes(keys0, branch + 1), flags)
            tot = tot + jnp.sum(factor) + jnp.sum(child.o)
        return tot

    probe("sample_specular_x2_ms", spec2)

    # 7. B.f alone (the lobe-table eval inside sum_over_lights)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                          (N, 3))

    def feval(h):
        return B.f(lobes0, h.wo, wi + jnp.sum(h.p) * 0.0,
                   lb.BSDF_ALL & ~lb.BSDF_SPECULAR)

    probe("bsdf_f_ms", feval)

    # 8. one unoccluded() shadow test
    p_light = hit0.p + jnp.asarray([0.0, 5.0, 0.0], jnp.float32)

    def shadow(h):
        return scene.unoccluded(h.p, p_light, n_geom=h.n)

    probe("unoccluded_ms", shadow)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
