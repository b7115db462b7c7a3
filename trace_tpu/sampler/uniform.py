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


def lane_keys(key, lane_id):
    """Per-lane PRNG keys from stable integer lane IDENTITIES (pixel
    raster id, photon index). Randomness follows who the lane IS, not
    where it sits in a chunk, so renders are bit-invariant to
    pixel_chunk boundaries and to device sharding (parallel/render.py,
    parallel/sppm.py run the exact single-chip sample streams)."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(lane_id)


def fold_lanes(keys, salt):
    """fold_in over a key array; ``salt`` is a scalar (may be traced,
    e.g. a fori_loop depth) or a per-lane int array (e.g. a path id)."""
    if jnp.ndim(salt) == 0:
        return jax.vmap(lambda k: jax.random.fold_in(k, salt))(keys)
    return jax.vmap(jax.random.fold_in)(keys, salt)


def uniform_lanes(keys, cols: int):
    """[N, cols] uniforms — one independent row per lane key."""
    return jax.vmap(lambda k: jax.random.uniform(k, (cols,), F32))(keys)


def ensure_lane_keys(key, n):
    """Normalize a scalar key to positional lane keys (direct-call /
    test convenience); per-lane key arrays pass through untouched."""
    if jnp.ndim(key) == 0:
        return lane_keys(key, jnp.arange(n, dtype=jnp.uint32))
    return key


def pixel_ids(pixel_xy):
    """Stable uint32 identity per pixel: (y << 16) | x on the 1-based
    raster coords (resolutions < 65536)."""
    x = pixel_xy[:, 0].astype(jnp.uint32)
    y = pixel_xy[:, 1].astype(jnp.uint32)
    return (y << jnp.uint32(16)) | x


def get_camera_samples_lanes(keys, pixel_xy):
    """Identity-keyed get_camera_samples: 5 uniforms per lane key ->
    (p_film, u_lens, u_time)."""
    cols = uniform_lanes(keys, 5)
    p_film = pixel_xy.astype(F32) + cols[:, :2]
    return p_film, cols[:, 2:4], cols[:, 4]


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
