"""SoA ray megabatches.

TPU-native counterpart of /root/reference/src/ray.jl. Instead of mutable
per-ray objects, a ``Rays`` pytree holds arrays over a megabatch of rays; the
wavefront integrators carry and rebuild these functionally each bounce.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.pytree import pytree, replace

F32 = jnp.float32


@pytree
class Rays:
    o: jnp.ndarray      # [..., 3]
    d: jnp.ndarray      # [..., 3]
    t_max: jnp.ndarray  # [...]
    time: jnp.ndarray   # [...]


@pytree
class RayDifferentials:
    """Primary rays plus one-pixel-shifted x/y rays (ray.jl:8-19)."""
    o: jnp.ndarray
    d: jnp.ndarray
    t_max: jnp.ndarray
    time: jnp.ndarray
    has_differentials: jnp.ndarray  # bool [...]
    rx_origin: jnp.ndarray
    ry_origin: jnp.ndarray
    rx_direction: jnp.ndarray
    ry_direction: jnp.ndarray


def make_rays(o, d, t_max=None, time=None) -> Rays:
    batch = o.shape[:-1]
    if t_max is None:
        t_max = jnp.full(batch, jnp.inf, F32)
    if time is None:
        time = jnp.zeros(batch, F32)
    return Rays(o, d, t_max, time)


def make_differentials(r: Rays) -> RayDifferentials:
    batch = r.o.shape[:-1]
    z = jnp.zeros_like(r.o)
    return RayDifferentials(
        r.o, r.d, r.t_max, r.time, jnp.zeros(batch, bool), z, z, z, z
    )


def base_rays(rd) -> Rays:
    return Rays(rd.o, rd.d, rd.t_max, rd.time)


def at(r, t):
    """Point along the ray: r(t)."""
    return r.o + r.d * t[..., None]


def check_direction(d):
    """Zero-snap near-zero components (reference ray.jl:25-29).

    Julia's `i ≈ 0f0` against a literal zero is an exact comparison, but the
    BVH traversal divides by the direction, so we snap |x| < 1e-18 to 0 and
    rely on IEEE inf semantics in the slab test like PBRT does.
    """
    return jnp.where(jnp.abs(d) < 1e-18, 0.0, d)


def scale_differentials(rd: RayDifferentials, s) -> RayDifferentials:
    """Narrow the differential rays for spp>1 (reference ray.jl:35-40).

    Note: the reference has a bug — it writes rx_direction twice and never
    sets ry_direction. We implement the intended behavior (both scaled);
    this only affects texture-filter footprints, not radiance.
    """
    return replace(
        rd,
        rx_origin=rd.o + (rd.rx_origin - rd.o) * s,
        ry_origin=rd.o + (rd.ry_origin - rd.o) * s,
        rx_direction=rd.d + (rd.rx_direction - rd.d) * s,
        ry_direction=rd.d + (rd.ry_direction - rd.d) * s,
    )


SPAWN_EPS = np.float32(1e-6)  # host scalar: device consts d2h at trace


def spawn_ray(p, direction, time, delta=SPAWN_EPS) -> Rays:
    """Offset-origin secondary ray (reference Trace.jl:196-211)."""
    origin = p + delta * direction
    return make_rays(origin, direction, time=time)


def spawn_ray_to(p0, p1, time, delta=SPAWN_EPS) -> Rays:
    """Shadow ray between two points; t_max stays inf to match the
    reference's spawn_ray(p0, p1) (Trace.jl:196-201) where the direction is
    unnormalized p1-p0 and occlusion is tested along the full ray."""
    direction = p1 - p0
    origin = p0 + delta * direction
    return make_rays(origin, direction, time=time)
