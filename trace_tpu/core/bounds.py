"""Axis-aligned bounding boxes (Bounds2/Bounds3).

TPU-native counterpart of /root/reference/src/bounds.jl. Bounds are pytrees
of ``p_min``/``p_max`` arrays and broadcast over leading batch dims; the slab
tests are written to be vmappable over rays and boxes (the BVH hot path).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree
from . import math as m


@pytree
class Bounds3:
    p_min: jnp.ndarray  # [..., 3]
    p_max: jnp.ndarray  # [..., 3]


@pytree
class Bounds2:
    p_min: jnp.ndarray  # [..., 2]
    p_max: jnp.ndarray  # [..., 2]


def empty3() -> Bounds3:
    """Invalid (empty) bounds (reference bounds.jl:12-13)."""
    return Bounds3(jnp.full((3,), jnp.inf, jnp.float32), jnp.full((3,), -jnp.inf, jnp.float32))


def from_point(p) -> Bounds3:
    return Bounds3(p, p)


def from_points(p1, p2) -> Bounds3:
    return Bounds3(jnp.minimum(p1, p2), jnp.maximum(p1, p2))


def union(b1: Bounds3, b2: Bounds3) -> Bounds3:
    return type(b1)(jnp.minimum(b1.p_min, b2.p_min), jnp.maximum(b1.p_max, b2.p_max))


def union_point(b: Bounds3, p) -> Bounds3:
    return type(b)(jnp.minimum(b.p_min, p), jnp.maximum(b.p_max, p))


def intersect_bounds(b1, b2):
    return type(b1)(jnp.maximum(b1.p_min, b2.p_min), jnp.minimum(b1.p_max, b2.p_max))


def is_valid(b: Bounds3):
    return jnp.all(b.p_min != jnp.inf, axis=-1) & jnp.all(b.p_max != -jnp.inf, axis=-1)


def inside(b: Bounds3, p):
    return jnp.all(p >= b.p_min, axis=-1) & jnp.all(p <= b.p_max, axis=-1)


def expand(b: Bounds3, delta) -> Bounds3:
    return Bounds3(b.p_min - delta, b.p_max + delta)


def diagonal(b):
    return b.p_max - b.p_min


def surface_area(b: Bounds3):
    d = diagonal(b)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 0] * d[..., 2] + d[..., 1] * d[..., 2])


def volume(b: Bounds3):
    d = diagonal(b)
    return d[..., 0] * d[..., 1] * d[..., 2]


def maximum_extent(b: Bounds3):
    """Index of the longest axis, 0-based (reference bounds.jl:112-120)."""
    d = diagonal(b)
    return jnp.where(
        (d[..., 0] > d[..., 1]) & (d[..., 0] > d[..., 2]),
        0,
        jnp.where(d[..., 1] > d[..., 2], 1, 2),
    )


def offset(b: Bounds3, p):
    """Relative position of p within the bounds (reference bounds.jl:134-143)."""
    o = p - b.p_min
    extent = b.p_max - b.p_min
    return o / jnp.where(extent > 0, extent, 1.0)


def lerp(b: Bounds3, t):
    return (1.0 - t) * b.p_min + t * b.p_max


def bounding_sphere(b: Bounds3):
    """(center, radius); radius 0 when center falls outside (bounds.jl:145-149)."""
    center = (b.p_min + b.p_max) / 2.0
    radius = jnp.where(inside(b, center), m.distance(center, b.p_max), 0.0)
    return center, radius


def corner(b: Bounds3, c: int):
    """One of the 8 corners, c in [0, 8)."""
    x = jnp.where(c & 1, b.p_max[..., 0], b.p_min[..., 0])
    y = jnp.where(c & 2, b.p_max[..., 1], b.p_min[..., 1])
    z = jnp.where(c & 4, b.p_max[..., 2], b.p_min[..., 2])
    return jnp.stack([x, y, z], axis=-1)


def _slab_lo_hi(t_a, t_b):
    """Per-axis slab interval, NaN-robust.

    When the ray origin lies exactly on a slab plane with a parallel
    direction, (p - o) * inv_d = 0 * inf = NaN. Treat that axis as
    always-overlapping (lo=-inf, hi=+inf), matching PBRT's convention
    that a ray on the boundary counts as inside the slab.
    """
    lo = jnp.minimum(t_a, t_b)
    hi = jnp.maximum(t_a, t_b)
    lo = jnp.where(jnp.isnan(lo), -jnp.inf, lo)
    hi = jnp.where(jnp.isnan(hi), jnp.inf, hi)
    return lo, hi


def ray_intersect(b: Bounds3, o, d, t_max):
    """Slab test returning (hit, t0, t1) (reference bounds.jl:151-167)."""
    inv_d = 1.0 / d
    lo, hi = _slab_lo_hi((b.p_min - o) * inv_d, (b.p_max - o) * inv_d)
    t0 = jnp.maximum(jnp.max(lo, axis=-1), 0.0)
    t1 = jnp.minimum(jnp.min(hi, axis=-1), t_max)
    hit = t0 <= t1
    return hit, t0, t1


def ray_intersect_p(b: Bounds3, o, inv_d, t_max):
    """Precomputed-reciprocal slab predicate (reference bounds.jl:180-200).

    Written sign-free: min/max of the two slab distances per axis is
    equivalent to the reference's dir_is_negative index selection.
    """
    lo, hi = _slab_lo_hi((b.p_min - o) * inv_d, (b.p_max - o) * inv_d)
    t0 = jnp.max(lo, axis=-1)
    t1 = jnp.min(hi, axis=-1)
    return (t0 <= t1) & (t0 < t_max) & (t1 > 0)
