"""Batched sphere intersection.

TPU-native counterpart of /root/reference/src/shapes/sphere.jl. All spheres
of a scene are packed into one SoA ``Spheres`` pytree; intersection runs as a
broadcast [rays x spheres] quadratic solve (the wavefront "cheap phase"),
and full hit frames are reconstructed only for each ray's winning sphere
(the "detail phase"). Clipped spheres (z_min/z_max/phi_max) are supported
exactly as in the reference (sphere.jl:13-30, 62-123).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.pytree import pytree
from ..core import math as m
from ..core import transform as T
from ..core.interaction import make_surface_hit

F32 = jnp.float32


@pytree
class Spheres:
    o2w: jnp.ndarray          # [S, 4, 4] object-to-world
    w2o: jnp.ndarray          # [S, 4, 4]
    radius: jnp.ndarray       # [S]
    z_min: jnp.ndarray        # [S]
    z_max: jnp.ndarray        # [S]
    theta_min: jnp.ndarray    # [S]
    theta_max: jnp.ndarray    # [S]
    phi_max: jnp.ndarray      # [S] radians
    material_id: jnp.ndarray  # [S] int32
    flip_normal: jnp.ndarray  # [S] bool: reverse_orientation (see pack note)


def pack_spheres(entries) -> Spheres:
    """Build a Spheres SoA from a list of dicts with keys:
    object_to_world (Transform), radius, z_min, z_max, phi_max (degrees),
    material_id, reverse_orientation.
    Derived clipping params mirror the reference ctor (sphere.jl:13-26)."""
    if not entries:
        return Spheres(*[np.zeros((0, 4, 4), np.float32)] * 2,
                       *[np.zeros((0,), np.float32)] * 6,
                       np.zeros((0,), np.int32), np.zeros((0,), bool))
    o2w, w2o = [], []
    radius, z_min, z_max, th_min, th_max, phi_max = [], [], [], [], [], []
    mat, flip = [], []
    for e in entries:
        t = e["object_to_world"]
        r = float(e["radius"])
        zmin = float(np.clip(min(e.get("z_min", -r), e.get("z_max", r)), -r, r))
        zmax = float(np.clip(max(e.get("z_min", -r), e.get("z_max", r)), -r, r))
        o2w.append(t.m)
        w2o.append(t.inv_m)
        radius.append(r)
        z_min.append(zmin)
        z_max.append(zmax)
        th_min.append(float(np.arccos(np.clip(zmin / r, -1, 1))))
        th_max.append(float(np.arccos(np.clip(zmax / r, -1, 1))))
        phi_max.append(float(np.deg2rad(np.clip(e.get("phi_max", 360.0), 0, 360))))
        mat.append(int(e["material_id"]))
        # Reference net normal = (rev XOR swaps) * invT(M) * n_obj
        # (object-space cross in the SurfaceInteraction ctor, then the
        # covariant transform, surface_interaction.jl:51-68 + :154-181).
        # We cross WORLD-space dpdu/dpdv (make_surface_hit), which already
        # carries sign(det M) = the swaps sign — so the packed flip is
        # reverse_orientation ALONE, or a mirrored sphere's normal would
        # double-flip (triangles differ: the reference bakes world verts
        # and crosses world edges, so THEY keep rev XOR swaps).
        flip.append(bool(e.get("reverse_orientation", False)))
    # Numpy leaves until Scene finalization (see triangle.pack_triangle_mesh).
    return Spheres(
        np.stack([np.asarray(x, np.float32) for x in o2w]),
        np.stack([np.asarray(x, np.float32) for x in w2o]),
        np.asarray(radius, np.float32), np.asarray(z_min, np.float32),
        np.asarray(z_max, np.float32),
        np.asarray(th_min, np.float32), np.asarray(th_max, np.float32),
        np.asarray(phi_max, np.float32),
        np.asarray(mat, np.int32), np.asarray(flip, bool),
    )


def num_spheres(s: Spheres) -> int:
    return s.radius.shape[0]


def world_bounds_np(s: Spheres) -> np.ndarray:
    """Host-side world AABBs [S, 2, 3] for BVH builds."""
    S = num_spheres(s)
    out = np.zeros((S, 2, 3), np.float32)
    o2w = np.asarray(s.o2w)
    r = np.asarray(s.radius)
    zmin, zmax = np.asarray(s.z_min), np.asarray(s.z_max)
    for i in range(S):
        corners = np.array(
            [
                [x, y, z]
                for x in (-r[i], r[i])
                for y in (-r[i], r[i])
                for z in (zmin[i], zmax[i])
            ],
            np.float32,
        )
        w = corners @ o2w[i][:3, :3].T + o2w[i][:3, 3]
        out[i, 0] = w.min(0)
        out[i, 1] = w.max(0)
    return out


def _compute_phi(p):
    phi = jnp.arctan2(p[..., 1], p[..., 0])
    return jnp.where(phi < 0.0, phi + 2.0 * m.PI, phi)


def _refine(p, radius):
    """Reproject candidate hit onto the sphere (sphere.jl:56-60)."""
    p = p * (radius / jnp.maximum(m.length(p), 1e-20))[..., None]
    tiny = (jnp.abs(p[..., 0]) < 1e-10) & (jnp.abs(p[..., 1]) < 1e-10)
    px = jnp.where(tiny, 1e-6 * radius, p[..., 0])
    return jnp.stack([px, p[..., 1], p[..., 2]], axis=-1)


def _clipped(sph, p, phi, idx=None):
    """Does the candidate point violate z/phi clipping? (sphere.jl:65-69)."""
    def g(x):
        return x if idx is None else x[idx]
    r, zmin, zmax, phimax = g(sph.radius), g(sph.z_min), g(sph.z_max), g(sph.phi_max)
    return (
        ((zmin > -r) & (p[..., 2] < zmin))
        | ((zmax < r) & (p[..., 2] > zmax))
        | (phi > phimax)
    )


def _candidate_t(sph: Spheres, o_obj, d_obj, t_max):
    """Quadratic solve + clip test; returns (hit, t) broadcast over the
    leading dims of o_obj/d_obj (which carry the [rays, spheres] pair grid).
    """
    a = m.length_squared(d_obj)
    b = 2.0 * m.dot(o_obj, d_obj)
    c = m.length_squared(o_obj) - sph.radius * sph.radius
    disc = b * b - 4.0 * a * c
    exists = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = -0.5 * (b + jnp.where(b < 0.0, -sq, sq))
    r0 = q / a
    r1 = c / jnp.where(q == 0.0, 1.0, q)
    r1 = jnp.where(q == 0.0, jnp.inf, r1)
    t0 = jnp.minimum(r0, r1)
    t1 = jnp.maximum(r0, r1)
    in_range = exists & (t0 <= t_max) & (t1 >= 0.0)
    t0 = jnp.where(t0 < 0.0, t1, t0)

    p0 = _refine(o_obj + d_obj * t0[..., None], sph.radius)
    phi0 = _compute_phi(p0)
    clip0 = _clipped(sph, p0, phi0)
    p1 = _refine(o_obj + d_obj * t1[..., None], sph.radius)
    phi1 = _compute_phi(p1)
    clip1 = _clipped(sph, p1, phi1)

    use_t1 = clip0
    t_hit = jnp.where(use_t1, t1, t0)
    hit = in_range & ~(clip0 & clip1) & (t_hit <= t_max) & jnp.isfinite(t_hit)
    return hit, t_hit


def _to_object(sph: Spheres, o, d):
    """Transform rays [N, 3] into each sphere's object space -> [N, S, 3]."""
    w2o = sph.w2o  # [S, 4, 4]
    # Exact f32 (einsum -> MXU bf16 default breaks on-surface points,
    # see core.math.mat3_apply).
    m33 = jnp.asarray(w2o)[None, :, :3, :3]            # [1, S, 3, 3]
    o_obj = m.mat3_apply(m33, o[:, None, :]) + jnp.asarray(w2o)[None, :, :3, 3]
    d_obj = m.mat3_apply(m33, d[:, None, :])
    return o_obj, d_obj


def intersect_all(sph: Spheres, o, d, t_max):
    """Cheap phase: per-(ray, sphere) hit mask and t. o,d: [N,3] world."""
    o_obj, d_obj = _to_object(sph, o, d)
    return _candidate_t(sph, o_obj, d_obj, t_max[:, None])


def intersect_closest(sph: Spheres, o, d, t_max):
    """Closest hit over all spheres: (hit[N], t[N], idx[N])."""
    hit, t = intersect_all(sph, o, d, t_max)
    t_masked = jnp.where(hit, t, jnp.inf)
    idx = jnp.argmin(t_masked, axis=-1).astype(jnp.int32)
    best_t = jnp.min(t_masked, axis=-1)  # == t_masked[idx], no gather
    return jnp.isfinite(best_t), best_t, idx


def intersect_p(sph: Spheres, o, d, t_max):
    """Any-hit occlusion predicate over all spheres."""
    hit, _ = intersect_all(sph, o, d, t_max)
    return jnp.any(hit, axis=-1)


def make_hit(sph: Spheres, o, d, time, t, idx, valid, prim_offset=0):
    """Detail phase: reconstruct the full surface frame for each ray's
    winning sphere (sphere.jl:150-163). Gathers sphere params at idx."""
    import jax

    sph = jax.tree.map(jnp.asarray, sph)  # np leaves -> traceable gathers
    g = lambda x: x[idx]
    w2o_m = g(sph.w2o)
    o2w_m = g(sph.o2w)
    o_obj = m.mat3_apply(w2o_m[:, :3, :3], o) + w2o_m[:, :3, 3]
    d_obj = m.mat3_apply(w2o_m[:, :3, :3], d)
    p = _refine(o_obj + d_obj * t[..., None], g(sph.radius))
    phi = _compute_phi(p)

    radius = g(sph.radius)
    th_min, th_max, phi_max = g(sph.theta_min), g(sph.theta_max), g(sph.phi_max)
    u = phi / phi_max
    theta = jnp.arccos(jnp.clip(p[..., 2] / radius, -1.0, 1.0))
    v = (theta - th_min) / (th_max - th_min)

    z_radius = jnp.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2)
    inv_zr = 1.0 / jnp.maximum(z_radius, 1e-20)
    cos_phi = p[..., 0] * inv_zr
    sin_phi = p[..., 1] * inv_zr

    dpdu = m.vec(-phi_max * p[..., 1], phi_max * p[..., 0], jnp.zeros_like(phi))
    dtheta = th_max - th_min
    dpdv = dtheta[..., None] * m.vec(
        p[..., 2] * cos_phi, p[..., 2] * sin_phi, -radius * jnp.sin(theta)
    )

    # Weingarten normal derivatives from the fundamental forms
    # (sphere.jl:96-123).
    d2pduu = (-phi_max * phi_max)[..., None] * m.vec(
        p[..., 0], p[..., 1], jnp.zeros_like(phi)
    )
    d2pduv = (dtheta * p[..., 2] * phi_max)[..., None] * m.vec(
        -sin_phi, cos_phi, jnp.zeros_like(phi)
    )
    d2pdvv = (dtheta * dtheta)[..., None] * -p
    E = m.dot(dpdu, dpdu)
    Fc = m.dot(dpdu, dpdv)
    G = m.dot(dpdv, dpdv)
    n_obj = m.normalize(m.cross(dpdu, dpdv))
    e = m.dot(n_obj, d2pduu)
    f = m.dot(n_obj, d2pduv)
    g2 = m.dot(n_obj, d2pdvv)
    inv_egf = 1.0 / jnp.maximum(E * G - Fc * Fc, 1e-20)
    dndu = ((f * Fc - e * G) * inv_egf)[..., None] * dpdu + (
        (e * Fc - f * E) * inv_egf
    )[..., None] * dpdv
    dndv = ((g2 * Fc - f * G) * inv_egf)[..., None] * dpdu + (
        (f * Fc - g2 * E) * inv_egf
    )[..., None] * dpdv

    # Object -> world.
    o2w = T.Transform(o2w_m, w2o_m)
    p_w = T.apply_point(o2w, p)
    dpdu_w = T.apply_vec(o2w, dpdu)
    dpdv_w = T.apply_vec(o2w, dpdv)
    dndu_w = T.apply_normal(o2w, dndu)
    dndv_w = T.apply_normal(o2w, dndv)

    wo = m.normalize(-d)
    return make_surface_hit(
        valid=valid, t=t, p=p_w, time=time, wo=wo,
        uv=jnp.stack([u, v], axis=-1),
        dpdu=dpdu_w, dpdv=dpdv_w, dndu=dndu_w, dndv=dndv_w,
        prim_id=(idx + prim_offset).astype(jnp.int32),
        material_id=g(sph.material_id),
        flip_normal=g(sph.flip_normal),
    )


def area(sph: Spheres):
    """Surface area of each sphere (sphere.jl:193)."""
    return sph.phi_max * sph.radius * (sph.z_max - sph.z_min)
