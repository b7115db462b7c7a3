"""Reconstruction filters.

TPU-native counterpart of /root/reference/src/filter.jl. Filters are small
static Python objects whose __call__ builds jnp expressions; the Film bakes
them into a 16x16 weight table once at construction, so the hot path never
evaluates a filter directly.
"""
from __future__ import annotations

import jax.numpy as jnp

PI = 3.1415926535897932


def _sinc(x):
    x = jnp.abs(x)
    xp = x * PI
    return jnp.where(x < 1e-5, 1.0, jnp.sin(xp) / jnp.where(x < 1e-5, 1.0, xp))


class Filter:
    """Base: radius is a static (x, y) tuple of floats."""

    radius: tuple

    def __call__(self, p):
        raise NotImplementedError


class LanczosSincFilter(Filter):
    """Windowed-sinc product filter (reference filter.jl:3-23)."""

    def __init__(self, radius=(1.0, 1.0), tau=3.0):
        if isinstance(radius, (int, float)):
            radius = (float(radius), float(radius))
        self.radius = (float(radius[0]), float(radius[1]))
        self.tau = float(tau)

    def _windowed(self, x, r):
        x = jnp.abs(x)
        return jnp.where(x > r, 0.0, _sinc(x) * _sinc(x / self.tau))

    def __call__(self, p):
        return self._windowed(p[..., 0], self.radius[0]) * self._windowed(
            p[..., 1], self.radius[1]
        )


class BoxFilter(Filter):
    def __init__(self, radius=(0.5, 0.5)):
        if isinstance(radius, (int, float)):
            radius = (float(radius), float(radius))
        self.radius = (float(radius[0]), float(radius[1]))

    def __call__(self, p):
        return jnp.ones_like(p[..., 0])


class TriangleFilter(Filter):
    def __init__(self, radius=(2.0, 2.0)):
        if isinstance(radius, (int, float)):
            radius = (float(radius), float(radius))
        self.radius = (float(radius[0]), float(radius[1]))

    def __call__(self, p):
        return jnp.maximum(0.0, self.radius[0] - jnp.abs(p[..., 0])) * jnp.maximum(
            0.0, self.radius[1] - jnp.abs(p[..., 1])
        )


class GaussianFilter(Filter):
    def __init__(self, radius=(2.0, 2.0), alpha=2.0):
        if isinstance(radius, (int, float)):
            radius = (float(radius), float(radius))
        self.radius = (float(radius[0]), float(radius[1]))
        self.alpha = float(alpha)

    def _g(self, d, r):
        import math

        exp_r = math.exp(-self.alpha * r * r)
        return jnp.maximum(0.0, jnp.exp(-self.alpha * d * d) - exp_r)

    def __call__(self, p):
        return self._g(p[..., 0], self.radius[0]) * self._g(p[..., 1], self.radius[1])
