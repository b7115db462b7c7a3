"""Stratified sampler.

The reference ships only a dead stub (src/sampler/stratified.jl:17, never
included — Trace.jl:238 comment); this is a working implementation:
jittered stratified samples over an x*y grid per pixel, batched over the
pixel megabatch. Used by passing it to any SamplerIntegrator in place of
UniformSampler.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

F32 = jnp.float32


class StratifiedSampler:
    """x_samples * y_samples jittered strata per pixel."""

    def __init__(self, x_samples: int = 2, y_samples: int = 2,
                 jitter: bool = True, seed: int = 0):
        self.x_samples = int(x_samples)
        self.y_samples = int(y_samples)
        self.samples_per_pixel = self.x_samples * self.y_samples
        self.jitter = bool(jitter)
        self.seed = int(seed)

    def stratum(self, sample_index: int):
        """(sx, sy) cell of the flat sample index."""
        return (sample_index % self.x_samples,
                sample_index // self.x_samples)


def get_camera_samples(sampler: StratifiedSampler, key, pixel_xy,
                       sample_index: int):
    """Stratified counterpart of uniform.get_camera_samples: the film
    jitter lands inside stratum `sample_index` of each pixel.

    pixel_xy: [N, 2] int pixel coords. Returns (p_film, u_lens, u_time).
    """
    n = pixel_xy.shape[0]
    sx, sy = sampler.stratum(sample_index)
    k1, k2, k3 = jax.random.split(key, 3)
    if sampler.jitter:
        u = jax.random.uniform(k1, (n, 2), F32)
    else:
        u = jnp.full((n, 2), 0.5, F32)
    offset = (jnp.asarray([sx, sy], F32) + u) / jnp.asarray(
        [sampler.x_samples, sampler.y_samples], F32
    )
    p_film = pixel_xy.astype(F32) + offset
    u_lens = jax.random.uniform(k2, (n, 2), F32)
    u_time = jax.random.uniform(k3, (n,), F32)
    return p_film, u_lens, u_time
