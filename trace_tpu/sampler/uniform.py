"""Uniform (pseudo-random) sampler.

TPU-native counterpart of /root/reference/src/sampler/sampler.jl:129-151.
The reference's UniformSampler draws plain rand() per request; here a
``UniformSampler`` wraps a jax PRNG key and hands out batched sample arrays
— each request splits the key functionally, so the render loop stays pure
and reproducible under any device sharding.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

F32 = jnp.float32


class UniformSampler:
    def __init__(self, samples_per_pixel: int = 1, seed: int = 0):
        self.samples_per_pixel = int(samples_per_pixel)
        self.seed = int(seed)


def get_1d(key, shape):
    return jax.random.uniform(key, shape, F32)


def get_2d(key, shape):
    return jax.random.uniform(key, tuple(shape) + (2,), F32)


def get_camera_samples(key, pixel_xy):
    """Batched get_camera_sample (sampler.jl:135-139): per-pixel jittered
    film position (1-based raster coords), lens sample, and time.

    pixel_xy: [N, 2] integer pixel coordinates (1-based like the reference's
    Bounds2 iteration). Returns (p_film [N,2], u_lens [N,2], u_time [N]).
    """
    n = pixel_xy.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    p_film = pixel_xy.astype(F32) + jax.random.uniform(k1, (n, 2), F32)
    u_lens = jax.random.uniform(k2, (n, 2), F32)
    u_time = jax.random.uniform(k3, (n,), F32)
    return p_film, u_lens, u_time
