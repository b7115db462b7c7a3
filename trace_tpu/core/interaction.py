"""Surface interactions as SoA hit records.

TPU-native counterpart of /root/reference/src/surface_interaction.jl. A
``SurfaceHit`` is the per-ray hit record produced by the intersectors and
consumed by materials/integrators — a pytree of arrays over the ray batch
instead of a mutable per-ray object.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree, replace
from . import math as m

F32 = jnp.float32


@pytree
class SurfaceHit:
    valid: jnp.ndarray        # bool [...]; False lanes carry garbage
    t: jnp.ndarray            # [...] hit distance
    p: jnp.ndarray            # [..., 3] world-space hit point
    time: jnp.ndarray         # [...]
    wo: jnp.ndarray           # [..., 3] outgoing (toward-camera) direction
    n: jnp.ndarray            # [..., 3] geometric normal
    uv: jnp.ndarray           # [..., 2]
    dpdu: jnp.ndarray         # [..., 3] geometric ∂p/∂u
    dpdv: jnp.ndarray         # [..., 3]
    # Shading frame (may differ from geometric after per-vertex normals).
    ns: jnp.ndarray           # [..., 3] shading normal
    s_dpdu: jnp.ndarray       # [..., 3]
    s_dpdv: jnp.ndarray       # [..., 3]
    s_dndu: jnp.ndarray       # [..., 3]
    s_dndv: jnp.ndarray       # [..., 3]
    prim_id: jnp.ndarray      # int32 [...]; global primitive index
    material_id: jnp.ndarray  # int32 [...]
    # Screen-space differentials for texture filtering.
    dudx: jnp.ndarray
    dudy: jnp.ndarray
    dvdx: jnp.ndarray
    dvdy: jnp.ndarray
    dpdx: jnp.ndarray         # [..., 3]
    dpdy: jnp.ndarray         # [..., 3]


def empty_hit(batch_shape) -> SurfaceHit:
    z3 = jnp.zeros(batch_shape + (3,), F32)
    z2 = jnp.zeros(batch_shape + (2,), F32)
    z = jnp.zeros(batch_shape, F32)
    zi = jnp.zeros(batch_shape, jnp.int32)
    return SurfaceHit(
        valid=jnp.zeros(batch_shape, bool),
        t=jnp.full(batch_shape, jnp.inf, F32),
        p=z3, time=z, wo=z3, n=z3, uv=z2, dpdu=z3, dpdv=z3,
        ns=z3, s_dpdu=z3, s_dpdv=z3, s_dndu=z3, s_dndv=z3,
        prim_id=zi - 1, material_id=zi - 1,
        dudx=z, dudy=z, dvdx=z, dvdy=z, dpdx=z3, dpdy=z3,
    )


def make_surface_hit(
    valid, t, p, time, wo, uv, dpdu, dpdv, dndu, dndv,
    prim_id, material_id, flip_normal=None,
) -> SurfaceHit:
    """Initialize geometric + shading frames from parametric derivatives
    (mirrors SurfaceInteraction ctor, surface_interaction.jl:51-68)."""
    n = m.normalize(m.cross(dpdu, dpdv))
    if flip_normal is not None:
        n = jnp.where(flip_normal[..., None], -n, n)
    batch = t.shape
    z = jnp.zeros(batch, F32)
    z3 = jnp.zeros(batch + (3,), F32)
    return SurfaceHit(
        valid=valid, t=t, p=p, time=time, wo=wo, n=n, uv=uv,
        dpdu=dpdu, dpdv=dpdv,
        ns=n, s_dpdu=dpdu, s_dpdv=dpdv, s_dndu=dndu, s_dndv=dndv,
        prim_id=prim_id, material_id=material_id,
        dudx=z, dudy=z, dvdx=z, dvdy=z, dpdx=z3, dpdy=z3,
    )


def set_shading_geometry(
    hit: SurfaceHit, tangent, bitangent, dndu, dndv,
    orientation_is_authoritative, reverse_xor_swaps, apply_mask,
) -> SurfaceHit:
    """Per-vertex-normal shading frame (surface_interaction.jl:70-88)."""
    ns = m.normalize(m.cross(tangent, bitangent))
    ns = jnp.where(reverse_xor_swaps[..., None], -ns, ns)
    n_auth = m.face_forward(hit.n, ns)          # geometric follows shading
    ns_non = m.face_forward(ns, hit.n)          # shading follows geometric
    auth = orientation_is_authoritative
    new_n = jnp.where(auth[..., None], n_auth, hit.n)
    new_ns = jnp.where(auth[..., None], ns, ns_non)
    mask = apply_mask[..., None]
    return replace(
        hit,
        n=jnp.where(mask, new_n, hit.n),
        ns=jnp.where(mask, new_ns, hit.ns),
        s_dpdu=jnp.where(mask, tangent, hit.s_dpdu),
        s_dpdv=jnp.where(mask, bitangent, hit.s_dpdv),
        s_dndu=jnp.where(mask, dndu, hit.s_dndu),
        s_dndv=jnp.where(mask, dndv, hit.s_dndv),
    )


def compute_differentials(hit: SurfaceHit, rd) -> SurfaceHit:
    """Screen-space (u, v) and p differentials for texture filtering.

    Follows PBRT's plane-offset solve. The reference
    (surface_interaction.jl:96-132) builds the 2x2 system from dimension
    *indices* instead of ∂p∂u/∂p∂v components — a deviation from PBRT that
    we do not replicate (it only affects texture filtering, and the
    reference ships no image textures). Cited: surface_interaction.jl:124.
    """
    n, p = hit.n, hit.p
    d = -m.dot(n, p)
    tx = (-m.dot(n, rd.rx_origin) - d) / m.dot(n, rd.rx_direction)
    ty = (-m.dot(n, rd.ry_origin) - d) / m.dot(n, rd.ry_direction)
    px = rd.rx_origin + tx[..., None] * rd.rx_direction
    py = rd.ry_origin + ty[..., None] * rd.ry_direction
    dpdx = px - p
    dpdy = py - p

    # Choose the two dimensions where the normal is smallest.
    an = jnp.abs(n)
    # dims as one-hot selectors
    use_yz = (an[..., 0] > an[..., 1]) & (an[..., 0] > an[..., 2])
    use_xz = (~use_yz) & (an[..., 1] > an[..., 2])
    d0 = jnp.where(use_yz, 1, 0)
    d1 = jnp.where(use_yz | use_xz, 2, 1)

    def pick(v, i):
        # Arithmetic 3-way select: take_along_axis along the 3-wide
        # component axis is a per-lane gather, 5-10x slower on TPU.
        return jnp.where(
            i == 0, v[..., 0], jnp.where(i == 1, v[..., 1], v[..., 2])
        )

    a00 = pick(hit.dpdu, d0)
    a01 = pick(hit.dpdv, d0)
    a10 = pick(hit.dpdu, d1)
    a11 = pick(hit.dpdv, d1)
    det = a00 * a11 - a01 * a10
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / jnp.where(det == 0, 1.0, det))
    bx0 = pick(px, d0) - pick(p, d0)
    bx1 = pick(px, d1) - pick(p, d1)
    by0 = pick(py, d0) - pick(p, d0)
    by1 = pick(py, d1) - pick(p, d1)
    dudx = (a11 * bx0 - a01 * bx1) * inv_det
    dvdx = (a00 * bx1 - a10 * bx0) * inv_det
    dudy = (a11 * by0 - a01 * by1) * inv_det
    dvdy = (a00 * by1 - a10 * by0) * inv_det

    has = rd.has_differentials
    z = jnp.zeros_like(dudx)
    z3 = jnp.zeros_like(dpdx)

    def sel(val, zero):
        return jnp.where(has[..., None] if val.ndim > has.ndim else has, val, zero)

    fin = lambda v: jnp.where(jnp.isfinite(v), v, 0.0)
    return replace(
        hit,
        dudx=sel(fin(dudx), z), dvdx=sel(fin(dvdx), z),
        dudy=sel(fin(dudy), z), dvdy=sel(fin(dvdy), z),
        dpdx=sel(fin(dpdx), z3), dpdy=sel(fin(dpdy), z3),
    )
