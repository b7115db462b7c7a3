"""Batched watertight triangle intersection.

TPU-native counterpart of /root/reference/src/shapes/triangle_mesh.jl. All
triangles of a scene are packed into one SoA ``Triangles`` pytree with
vertices pre-transformed to world space at build time (triangle_mesh.jl:23).
Intersection is the permute-to-ray-space + shear watertight method
(triangle_mesh.jl:99-123, 187-243) broadcast over [rays x triangles]; full
shading frames (per-vertex normals, uv interpolation) are reconstructed only
for each ray's winning triangle.

The reference's Float64 edge-function fallback (triangle_mesh.jl:194-197)
is reproduced without f64 via double-single arithmetic (``exact_edges``):
where an edge function is exactly 0 at f32, an error-free two-float
product difference recovers the f64 sign. Off by default on the
accelerated sweep paths (they use the Moller-Trumbore factorization);
enable per scene with ``SceneBuilder.build(exact_shared_edges=True)`` for
the brute-force and winner-detail paths.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.pytree import pytree, replace
from ..core import math as m
from ..core.interaction import make_surface_hit, set_shading_geometry

F32 = jnp.float32


@pytree
class Triangles:
    v0: jnp.ndarray           # [T, 3] world-space vertices
    v1: jnp.ndarray
    v2: jnp.ndarray
    n0: jnp.ndarray           # [T, 3] per-vertex normals (zeros if none)
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray          # [T, 2]
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    has_normals: jnp.ndarray  # [T] bool
    material_id: jnp.ndarray  # [T] int32
    flip_normal: jnp.ndarray  # [T] bool: reverse_orientation XOR swaps_handedness


def pack_triangle_mesh(
    object_to_world,
    indices: np.ndarray,
    vertices: np.ndarray,
    normals: np.ndarray | None = None,
    uv: np.ndarray | None = None,
    material_id: int = 0,
    reverse_orientation: bool = False,
) -> Triangles:
    """Build a Triangles SoA from an indexed mesh; vertices (and normals)
    are transformed to world space here, as in the reference TriangleMesh
    ctor (triangle_mesh.jl:23)."""
    o2w = np.asarray(object_to_world.m, np.float32)
    inv = np.asarray(object_to_world.inv_m, np.float32)
    verts = np.asarray(vertices, np.float32)
    verts_w = verts @ o2w[:3, :3].T + o2w[:3, 3]
    idx = np.asarray(indices, np.int64).reshape(-1, 3)
    tcount = idx.shape[0]

    # Leaves stay numpy until Scene finalization: host-side consumers
    # (BVH/cluster builds, world bounds, light areas) read them for free,
    # and no device->host transfer ever happens during scene build — a
    # single d2h permanently degrades the TPU relay's dispatch latency.
    def gather(arr, k):
        return np.ascontiguousarray(arr[idx[:, k]], np.float32)

    if normals is not None:
        norms = np.asarray(normals, np.float32) @ inv[:3, :3]  # inverse transpose
        has_n = np.ones(tcount, bool)
    else:
        norms = np.zeros_like(verts)
        has_n = np.zeros(tcount, bool)
    if uv is not None:
        uvs = np.asarray(uv, np.float32)
    else:
        # Default parametric corners (triangle_mesh.jl:79-83).
        uvs = None

    def uv_at(k):
        if uvs is not None:
            return np.ascontiguousarray(uvs[idx[:, k]], np.float32)
        default = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]], np.float32)[k]
        return np.broadcast_to(default, (tcount, 2)).copy()

    swaps = bool(np.linalg.det(o2w[:3, :3]) < 0)
    flip = np.full(tcount, bool(reverse_orientation) ^ swaps)
    return Triangles(
        gather(verts_w, 0), gather(verts_w, 1), gather(verts_w, 2),
        gather(norms, 0), gather(norms, 1), gather(norms, 2),
        uv_at(0), uv_at(1), uv_at(2),
        has_n, np.full((tcount,), material_id, np.int32),
        flip,
    )


def concat_triangles(parts) -> Triangles:
    parts = [p for p in parts if p.v0.shape[0] > 0]
    if not parts:
        return empty_triangles()
    if len(parts) == 1:  # single mesh: no copy (~0.3 s at 1M tris)
        return parts[0]
    import jax
    return jax.tree.map(lambda *xs: np.concatenate(
        [np.asarray(x) for x in xs], axis=0), *parts)


def empty_triangles() -> Triangles:
    z3 = np.zeros((0, 3), np.float32)
    z2 = np.zeros((0, 2), np.float32)
    return Triangles(z3, z3, z3, z3, z3, z3, z2, z2, z2,
                     np.zeros((0,), bool), np.zeros((0,), np.int32),
                     np.zeros((0,), bool))


def num_triangles(t: Triangles) -> int:
    return t.v0.shape[0]


def transform_triangles(t: Triangles, transform) -> Triangles:
    """Apply an affine Transform to a Triangles SoA, traced-safe — the
    per-frame motion helper for the animated-geometry path
    (SamplerIntegrator.render(geometry=...)). Vertices go through the
    full matrix, normals through the inverse transpose
    (transformations.jl:140 covariance rule), all in exact-f32 VPU
    arithmetic (core.math.mat3_apply — TPU MXU matmuls multiply in bf16
    by default, which corrupts on-surface geometry)."""
    import dataclasses

    mat = jnp.asarray(transform.m, jnp.float32)
    inv = jnp.asarray(transform.inv_m, jnp.float32)
    m33 = mat[:3, :3]
    tr = mat[:3, 3]
    pt = lambda v: m.mat3_apply(m33, v) + tr
    nrm = lambda n: m.mat3_apply_t(inv[:3, :3], n)
    # A handedness-swapping transform (det < 0, e.g. a mirror) flips the
    # cross(e1,e2) geometric normal, so re-establish pack_triangle_mesh's
    # invariant (flip = reverse_orientation XOR swaps_handedness) by
    # XOR-ing the determinant sign in.
    swaps = jnp.linalg.det(m33) < 0
    return dataclasses.replace(
        t,
        v0=pt(t.v0), v1=pt(t.v1), v2=pt(t.v2),
        n0=nrm(t.n0), n1=nrm(t.n1), n2=nrm(t.n2),
        flip_normal=t.flip_normal ^ swaps,
    )


def world_bounds_np(t: Triangles) -> np.ndarray:
    """Host-side world AABBs [T, 2, 3] for BVH builds."""
    v0, v1, v2 = (np.asarray(x) for x in (t.v0, t.v1, t.v2))
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    return np.stack([lo, hi], axis=1)


def areas(t: Triangles):
    return 0.5 * m.length(m.cross(t.v1 - t.v0, t.v2 - t.v0))


def areas_np(t: Triangles) -> np.ndarray:
    """Host-side triangle areas (no device round-trip)."""
    v0, v1, v2 = (np.asarray(x) for x in (t.v0, t.v1, t.v2))
    c = np.cross(v1 - v0, v2 - v0)
    return 0.5 * np.sqrt((c * c).sum(-1)).astype(np.float32)


def _ray_space_edges(v0, v1, v2, o, d, exact_edges=False):
    """Translate+permute+shear vertices into ray space and evaluate the three
    2D edge functions (triangle_mesh.jl:85-123). Broadcasts over any pair
    grid: v* are [..., 3] and o/d broadcast against them.

    Returns (e0, e1, e2, z0, z1, z2, shear_z_scaled) where z* are the sheared
    z coordinates already multiplied by shear_z.
    """
    # Cyclic permutation (kx, ky, kz) with kz = argmax |d|, selected by
    # arithmetic where-chains instead of take_along_axis: per-lane gathers
    # along the 3-wide component axis are 5-10x slower on TPU and block
    # XLA fusion (measured on v5e).
    ad = jnp.abs(d)
    m0 = (ad[..., 0] >= ad[..., 1]) & (ad[..., 0] >= ad[..., 2])  # kz = 0
    m1 = ~m0 & (ad[..., 1] >= ad[..., 2])                          # kz = 1

    def perm3(v):
        """(v[kx], v[ky], v[kz]) for the cyclic permutation above."""
        c0, c1, c2 = v[..., 0], v[..., 1], v[..., 2]
        vx = jnp.where(m0, c1, jnp.where(m1, c2, c0))
        vy = jnp.where(m0, c2, jnp.where(m1, c0, c1))
        vz = jnp.where(m0, c0, jnp.where(m1, c1, c2))
        return vx, vy, vz

    dx, dy, dz = perm3(d)
    inv_dz = 1.0 / dz
    sx = -dx * inv_dz
    sy = -dy * inv_dz
    sz = inv_dz

    def shear(v):
        tx, ty, tz = perm3(v - o)
        return tx + sx * tz, ty + sy * tz, tz

    x0, y0, z0 = shear(v0)
    x1, y1, z1 = shear(v1)
    x2, y2, z2 = shear(v2)

    e0 = x1 * y2 - y1 * x2
    e1 = x2 * y0 - y2 * x0
    e2 = x0 * y1 - y0 * x1
    if exact_edges:
        # The reference's Float64 fallback (triangle_mesh.jl:194-197):
        # when an edge function is exactly 0 at f32, it recomputes the
        # products of the SHEARED f32 coordinates in f64. A double-single
        # (two-float) error-free product difference reproduces that sign
        # exactly without f64: f64(a)*f64(b) of f32 inputs is exact, and
        # twoProd(a,b) = (fl(ab), err) captures the same value in two
        # f32s (Dekker/Veltkamp split — no FMA dependence).
        need = (e0 == 0.0) | (e1 == 0.0) | (e2 == 0.0)
        e0 = jnp.where(need, _edge_ds(x1, y2, y1, x2), e0)
        e1 = jnp.where(need, _edge_ds(x2, y0, y2, x0), e1)
        e2 = jnp.where(need, _edge_ds(x0, y1, y0, x1), e2)
    return e0, e1, e2, z0 * sz, z1 * sz, z2 * sz


_SPLIT = np.float32(4097.0)  # 2^12 + 1 (Veltkamp split constant for f32)


def _two_prod(a, b):
    """Error-free product: (fl(a*b), err) with a*b == fl+err exactly."""
    p = a * b
    ah = a * _SPLIT
    ah = ah - (ah - a)
    al = a - ah
    bh = b * _SPLIT
    bh = bh - (bh - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _edge_ds(a, b, c, d_):
    """sign-exact a*b - c*d via double-single arithmetic.

    Only consumed where fl(fl(ab) - fl(cd)) == 0, i.e. fl(ab) == fl(cd);
    their difference is then exact (Sterbenz), so the result reduces to
    the error-term difference — the same value the reference's f64
    recompute yields."""
    p1, s1 = _two_prod(a, b)
    p2, s2 = _two_prod(c, d_)
    return (p1 - p2) + (s1 - s2)


def _intersect_core(v0, v1, v2, o, d, t_max, exact_edges=False):
    """Watertight test; returns (hit, t, b0, b1, b2)."""
    # EXACT zero like the reference (triangle_mesh.jl:65-67: (v.v) ~ 0f0
    # is isapprox against a zero literal = exact equality at atol 0) — an
    # absolute threshold silently discarded valid triangles with edges
    # under ~3e-5 world units. Padding slots keep an exact-zero cross.
    degenerate = m.length_squared(m.cross(v2 - v0, v1 - v0)) == 0.0

    e0, e1, e2, z0s, z1s, z2s = _ray_space_edges(v0, v1, v2, o, d,
                                                 exact_edges)
    mixed = ((e0 < 0) | (e1 < 0) | (e2 < 0)) & ((e0 > 0) | (e1 > 0) | (e2 > 0))
    det = e0 + e1 + e2
    near_zero_det = det == 0.0

    t_scaled = e0 * z0s + e1 * z1s + e2 * z2s
    bad_neg = (det < 0) & ((t_scaled >= 0) | (t_scaled < t_max * det))
    bad_pos = (det > 0) & ((t_scaled <= 0) | (t_scaled > t_max * det))

    inv_det = 1.0 / jnp.where(near_zero_det, 1.0, det)
    t = t_scaled * inv_det
    b0, b1, b2 = e0 * inv_det, e1 * inv_det, e2 * inv_det
    hit = ~degenerate & ~mixed & ~near_zero_det & ~bad_neg & ~bad_pos
    return hit, t, b0, b1, b2


def intersect_all(tris: Triangles, o, d, t_max, exact_edges=False):
    """Cheap phase over the [N rays x T triangles] grid: (hit, t)."""
    v0 = tris.v0[None, :, :]
    v1 = tris.v1[None, :, :]
    v2 = tris.v2[None, :, :]
    o_b = o[:, None, :]
    d_b = d[:, None, :]
    hit, t, _, _, _ = _intersect_core(v0, v1, v2, o_b, d_b, t_max[:, None],
                                      exact_edges)
    return hit, t


def intersect_closest(tris: Triangles, o, d, t_max):
    hit, t = intersect_all(tris, o, d, t_max)
    t_masked = jnp.where(hit, t, jnp.inf)
    idx = jnp.argmin(t_masked, axis=-1).astype(jnp.int32)
    best_t = jnp.min(t_masked, axis=-1)  # == t_masked[idx], no gather
    return jnp.isfinite(best_t), best_t, idx


def intersect_p(tris: Triangles, o, d, t_max):
    hit, _ = intersect_all(tris, o, d, t_max)
    return jnp.any(hit, axis=-1)


def make_hit(tris: Triangles, o, d, time, idx, valid, prim_offset=0,
             exact_edges=False, trust_valid=False):
    """Detail phase for each ray's winning triangle: barycentric interp of
    p/uv, uv-based ∂p, per-vertex-normal shading frame
    (triangle_mesh.jl:125-185, 216-242).

    ``trust_valid``: keep the caller's valid mask instead of AND-ing the
    watertight recompute's acceptance back in. Used by the certified
    accelerator paths (exact_shared_edges on a sweep accel): a winner the
    certified-widened MT test accepted exactly ON a shared edge can be
    rejected by this recompute's strict edge signs — re-masking would
    reintroduce the leak the certification just closed. The barycentrics
    and t are still this recompute's values (well-conditioned within the
    certified error radius of the triangle)."""
    import jax

    tris = jax.tree.map(jnp.asarray, tris)  # np leaves -> traceable gathers
    g = lambda x: x[idx]
    v0, v1, v2 = g(tris.v0), g(tris.v1), g(tris.v2)
    hit, t, b0, b1, b2 = _intersect_core(
        v0, v1, v2, o, d, jnp.full(o.shape[:-1], jnp.inf, F32),
        exact_edges,
    )
    if not trust_valid:
        valid = valid & hit

    uv0, uv1, uv2 = g(tris.uv0), g(tris.uv1), g(tris.uv2)
    duv13 = uv0 - uv2
    duv23 = uv1 - uv2
    dp13 = v0 - v2
    dp23 = v1 - v2
    uv_det = duv13[..., 0] * duv23[..., 1] - duv13[..., 1] * duv23[..., 0]
    uv_degen = jnp.abs(uv_det) < 1e-12
    inv_uv_det = 1.0 / jnp.where(uv_degen, 1.0, uv_det)
    dpdu = (duv23[..., 1:2] * dp13 - duv13[..., 1:2] * dp23) * inv_uv_det[..., None]
    dpdv = (-duv23[..., 0:1] * dp13 + duv13[..., 0:1] * dp23) * inv_uv_det[..., None]
    # Degenerate uv: any frame orthogonal to the geometric normal.
    ng = m.normalize(m.cross(v2 - v0, v1 - v0))
    _, fb_u, fb_v = m.coordinate_system(ng)
    dpdu = jnp.where(uv_degen[..., None], fb_u, dpdu)
    dpdv = jnp.where(uv_degen[..., None], fb_v, dpdv)

    p = b0[..., None] * v0 + b1[..., None] * v1 + b2[..., None] * v2
    uv = b0[..., None] * uv0 + b1[..., None] * uv1 + b2[..., None] * uv2

    z3 = jnp.zeros_like(p)
    wo = m.normalize(-d)
    hit_rec = make_surface_hit(
        valid=valid, t=t, p=p, time=time, wo=wo, uv=uv,
        dpdu=dpdu, dpdv=dpdv, dndu=z3, dndv=z3,
        prim_id=(idx + prim_offset).astype(jnp.int32),
        material_id=g(tris.material_id),
        flip_normal=None,
    )
    # Geometric normal from edge cross product (triangle_mesh.jl:230),
    # then shading geometry from interpolated per-vertex normals.
    n_geom = m.normalize(m.cross(dp13, dp23))
    hit_rec = replace(hit_rec, n=n_geom, ns=n_geom)

    has_n = g(tris.has_normals)
    n0, n1, n2 = g(tris.n0), g(tris.n1), g(tris.n2)
    ns_interp = b0[..., None] * n0 + b1[..., None] * n1 + b2[..., None] * n2
    ns_len2 = m.length_squared(ns_interp)
    ns = jnp.where((ns_len2 > 0)[..., None], m.normalize(ns_interp), n_geom)
    # Tangent from dpdu, orthogonalized against ns (triangle_mesh.jl:171-182).
    ss = m.normalize(hit_rec.s_dpdu)
    ts = m.cross(ns, ss)
    ok = m.length_squared(ts) > 0
    ts_n = m.normalize(ts)
    ss_n = m.cross(ts_n, ns)
    _, ss_fb, ts_fb = m.coordinate_system(ns)
    ss = jnp.where(ok[..., None], ss_n, ss_fb)
    ts = jnp.where(ok[..., None], ts_n, ts_fb)

    # ∂n/∂u, ∂n/∂v from per-vertex normals (triangle_mesh.jl:143-158).
    dn13 = n0 - n2
    dn23 = n1 - n2
    dndu = (duv23[..., 1:2] * dn13 - duv13[..., 1:2] * dn23) * inv_uv_det[..., None]
    dndv = (-duv23[..., 0:1] * dn13 + duv13[..., 0:1] * dn23) * inv_uv_det[..., None]
    dndu = jnp.where(uv_degen[..., None], 0.0, dndu)
    dndv = jnp.where(uv_degen[..., None], 0.0, dndv)

    flip = g(tris.flip_normal)
    hit_rec = set_shading_geometry(
        hit_rec, ss, ts, dndu, dndv,
        orientation_is_authoritative=jnp.ones_like(has_n),
        reverse_xor_swaps=flip,
        apply_mask=has_n,
    )
    # Without per-vertex normals: flip both normals by orientation/handedness
    # (triangle_mesh.jl:238-239).
    flip_plain = (~has_n) & flip
    n_final = jnp.where(flip_plain[..., None], -hit_rec.n, hit_rec.n)
    ns_final = jnp.where(flip_plain[..., None], -hit_rec.ns, hit_rec.ns)
    return replace(hit_rec, n=n_final, ns=ns_final)
