"""Planar-layout geometry: rays, hit records, intersectors.

This is the round-5 hot-path rewrite of scene.intersect's detail phase
and core/interaction.py in the planar component layout (core/vec.py):
every 3-vector is three flat [N] arrays, every intermediate a 1-D
elementwise op. Semantics are the packed twins', formula for formula —
sphere detail: shapes/sphere.py make_hit (sphere.jl:150-163); triangle
detail: shapes/triangle.py make_hit (triangle_mesh.jl:125-185,216-242);
differentials: core/interaction.py compute_differentials. Equality vs
the packed path is pinned by tests/test_wavefront_equiv.py.

Gather discipline: winner-detail gathers go through ONE per-primitive
row matrix (``sphere_rows`` / ``triangle_rows``, host numpy — embeds
free at trace time) instead of per-field gathers.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import vec as V
from ..core.vec import V3

F32 = jnp.float32


class RayP(NamedTuple):
    """Planar twin of core.ray.RayDifferentials."""
    o: V3
    d: V3
    t_max: jnp.ndarray
    time: jnp.ndarray
    has_differentials: jnp.ndarray
    rx_origin: V3
    ry_origin: V3
    rx_direction: V3
    ry_direction: V3

    @staticmethod
    def of(rd):
        return RayP(
            V3.of(rd.o), V3.of(rd.d), rd.t_max, rd.time,
            rd.has_differentials,
            V3.of(rd.rx_origin), V3.of(rd.ry_origin),
            V3.of(rd.rx_direction), V3.of(rd.ry_direction),
        )


class HitP(NamedTuple):
    """Planar twin of core.interaction.SurfaceHit (uv split to u, v)."""
    valid: jnp.ndarray
    t: jnp.ndarray
    p: V3
    time: jnp.ndarray
    wo: V3
    n: V3
    u: jnp.ndarray
    v: jnp.ndarray
    dpdu: V3
    dpdv: V3
    ns: V3
    s_dpdu: V3
    s_dpdv: V3
    s_dndu: V3
    s_dndv: V3
    prim_id: jnp.ndarray
    material_id: jnp.ndarray
    dudx: jnp.ndarray
    dudy: jnp.ndarray
    dvdx: jnp.ndarray
    dvdy: jnp.ndarray
    dpdx: V3
    dpdy: V3

    # -- packed-compat facade (textures read .uv/.p/.t/...) ---------------
    @property
    def uv(self):
        return jnp.stack([self.u, self.v], axis=-1)


def hitp_from_packed(hit) -> HitP:
    return HitP(
        valid=hit.valid, t=hit.t, p=V3.of(hit.p), time=hit.time,
        wo=V3.of(hit.wo), n=V3.of(hit.n),
        u=hit.uv[..., 0], v=hit.uv[..., 1],
        dpdu=V3.of(hit.dpdu), dpdv=V3.of(hit.dpdv), ns=V3.of(hit.ns),
        s_dpdu=V3.of(hit.s_dpdu), s_dpdv=V3.of(hit.s_dpdv),
        s_dndu=V3.of(hit.s_dndu), s_dndv=V3.of(hit.s_dndv),
        prim_id=hit.prim_id, material_id=hit.material_id,
        dudx=hit.dudx, dudy=hit.dudy, dvdx=hit.dvdx, dvdy=hit.dvdy,
        dpdx=V3.of(hit.dpdx), dpdy=V3.of(hit.dpdy),
    )


def hitp_to_packed(h: HitP):
    from ..core.interaction import SurfaceHit

    return SurfaceHit(
        valid=h.valid, t=h.t, p=h.p.arr(), time=h.time, wo=h.wo.arr(),
        n=h.n.arr(), uv=jnp.stack([h.u, h.v], axis=-1),
        dpdu=h.dpdu.arr(), dpdv=h.dpdv.arr(), ns=h.ns.arr(),
        s_dpdu=h.s_dpdu.arr(), s_dpdv=h.s_dpdv.arr(),
        s_dndu=h.s_dndu.arr(), s_dndv=h.s_dndv.arr(),
        prim_id=h.prim_id, material_id=h.material_id,
        dudx=h.dudx, dudy=h.dudy, dvdx=h.dvdx, dvdy=h.dvdy,
        dpdx=h.dpdx.arr(), dpdy=h.dpdy.arr(),
    )


def empty_hitp(n) -> HitP:
    z = jnp.zeros((n,), F32)
    zi = jnp.zeros((n,), jnp.int32)
    z3 = V3.zeros((n,))
    return HitP(
        valid=jnp.zeros((n,), bool), t=jnp.full((n,), jnp.inf, F32),
        p=z3, time=z, wo=z3, n=z3, u=z, v=z, dpdu=z3, dpdv=z3,
        ns=z3, s_dpdu=z3, s_dpdv=z3, s_dndu=z3, s_dndv=z3,
        prim_id=zi - 1, material_id=zi - 1,
        dudx=z, dudy=z, dvdx=z, dvdy=z, dpdx=z3, dpdy=z3,
    )


# ---------------------------------------------------------------------------
# Cheap phase: [N, P] pair grids, componentwise
# ---------------------------------------------------------------------------


def _sphere_cols(sph):
    """Host component columns of the sphere table (numpy: free at trace)."""
    w2o = np.asarray(sph.w2o)  # [S, 4, 4]
    return {
        "R": [[w2o[None, :, i, j] for j in range(3)] for i in range(3)],
        "tr": [w2o[None, :, i, 3] for i in range(3)],
        "radius": np.asarray(sph.radius)[None, :],
        "z_min": np.asarray(sph.z_min)[None, :],
        "z_max": np.asarray(sph.z_max)[None, :],
        "phi_max": np.asarray(sph.phi_max)[None, :],
    }


def _sphere_candidate(cols, o_obj: V3, d_obj: V3, t_max):
    """Quadratic + refine + clip on the pair grid (twin of
    sphere._candidate_t, sphere.jl:39-69). All operands [N, S]."""
    radius = cols["radius"]
    a = d_obj.length_squared()
    b = 2.0 * o_obj.dot(d_obj)
    c = o_obj.length_squared() - radius * radius
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

    def refine_clip(t):
        p = o_obj + d_obj * t
        pr = _refine_p(p, radius)
        phi = _phi_of(pr)
        return pr, _clip_violated(cols, pr, phi)

    _, clip0 = refine_clip(t0)
    _, clip1 = refine_clip(t1)
    t_hit = jnp.where(clip0, t1, t0)
    hit = in_range & ~(clip0 & clip1) & (t_hit <= t_max) & jnp.isfinite(t_hit)
    return hit, t_hit


def _refine_p(p: V3, radius) -> V3:
    """shapes/sphere._refine twin (sphere.jl:56-60)."""
    s = radius / jnp.maximum(p.length(), 1e-20)
    p = p * s
    tiny = (jnp.abs(p.x) < 1e-10) & (jnp.abs(p.y) < 1e-10)
    return V3(jnp.where(tiny, 1e-6 * radius, p.x), p.y, p.z)


def _phi_of(p: V3):
    phi = jnp.arctan2(p.y, p.x)
    return jnp.where(phi < 0.0, phi + 2.0 * V.PI, phi)


def _clip_violated(cols, p: V3, phi):
    r, zmin, zmax = cols["radius"], cols["z_min"], cols["z_max"]
    return (
        ((zmin > -r) & (p.z < zmin))
        | ((zmax < r) & (p.z > zmax))
        | (phi > cols["phi_max"])
    )


def spheres_closest(sph, o: V3, d: V3, t_max):
    """Closest sphere hit: (hit [N], t [N], idx [N])."""
    cols = _sphere_cols(sph)
    ob, db = _to_object_grid(cols, o, d)
    hit, t = _sphere_candidate(cols, ob, db, t_max[:, None])
    tm = jnp.where(hit, t, jnp.inf)
    idx = jnp.argmin(tm, axis=-1).astype(jnp.int32)
    best = jnp.min(tm, axis=-1)
    return jnp.isfinite(best), best, idx


def spheres_anyhit(sph, o: V3, d: V3, t_max):
    cols = _sphere_cols(sph)
    ob, db = _to_object_grid(cols, o, d)
    hit, _ = _sphere_candidate(cols, ob, db, t_max[:, None])
    return jnp.any(hit, axis=-1)


def _to_object_grid(cols, o: V3, d: V3):
    """World [N] rays -> per-sphere object space [N, S] components."""
    R, tr = cols["R"], cols["tr"]
    ox, oy, oz = o.x[:, None], o.y[:, None], o.z[:, None]
    dx, dy, dz = d.x[:, None], d.y[:, None], d.z[:, None]
    ob = V3(
        R[0][0] * ox + R[0][1] * oy + R[0][2] * oz + tr[0],
        R[1][0] * ox + R[1][1] * oy + R[1][2] * oz + tr[1],
        R[2][0] * ox + R[2][1] * oy + R[2][2] * oz + tr[2],
    )
    db = V3(
        R[0][0] * dx + R[0][1] * dy + R[0][2] * dz,
        R[1][0] * dx + R[1][1] * dy + R[1][2] * dz,
        R[2][0] * dx + R[2][1] * dy + R[2][2] * dz,
    )
    return ob, db


def _tri_grid_cols(tris):
    v = {}
    for name in ("v0", "v1", "v2"):
        arr = np.asarray(getattr(tris, name))
        v[name] = V3(arr[None, :, 0], arr[None, :, 1], arr[None, :, 2])
    return v


def _watertight(v0: V3, v1: V3, v2: V3, o: V3, d: V3, t_max):
    """Componentwise watertight test (twin of triangle._intersect_core /
    _ray_space_edges, triangle_mesh.jl:85-123,187-215). Operands
    broadcast to the [N, T] pair grid; o/d components are [N, 1].
    Returns (hit, t, b0, b1, b2)."""
    e01, e02 = v2 - v0, v1 - v0
    degenerate = e01.cross(e02).length_squared() == 0.0

    ad_x, ad_y, ad_z = jnp.abs(d.x), jnp.abs(d.y), jnp.abs(d.z)
    m0 = (ad_x >= ad_y) & (ad_x >= ad_z)
    m1 = ~m0 & (ad_y >= ad_z)

    def perm3(w: V3):
        vx = jnp.where(m0, w.y, jnp.where(m1, w.z, w.x))
        vy = jnp.where(m0, w.z, jnp.where(m1, w.x, w.y))
        vz = jnp.where(m0, w.x, jnp.where(m1, w.y, w.z))
        return vx, vy, vz

    dx, dy, dz = perm3(d)
    inv_dz = 1.0 / dz
    sx = -dx * inv_dz
    sy = -dy * inv_dz
    sz = inv_dz

    def shear(vv: V3):
        tx, ty, tz = perm3(vv - o)
        return tx + sx * tz, ty + sy * tz, tz

    x0, y0, z0 = shear(v0)
    x1, y1, z1 = shear(v1)
    x2, y2, z2 = shear(v2)

    e0 = x1 * y2 - y1 * x2
    e1 = x2 * y0 - y2 * x0
    e2 = x0 * y1 - y0 * x1

    mixed = (((e0 < 0) | (e1 < 0) | (e2 < 0))
             & ((e0 > 0) | (e1 > 0) | (e2 > 0)))
    det = e0 + e1 + e2
    near_zero_det = det == 0.0
    t_scaled = e0 * (z0 * sz) + e1 * (z1 * sz) + e2 * (z2 * sz)
    bad_neg = (det < 0) & ((t_scaled >= 0) | (t_scaled < t_max * det))
    bad_pos = (det > 0) & ((t_scaled <= 0) | (t_scaled > t_max * det))
    inv_det = 1.0 / jnp.where(near_zero_det, 1.0, det)
    t = t_scaled * inv_det
    hit = ~degenerate & ~mixed & ~near_zero_det & ~bad_neg & ~bad_pos
    return hit, t, e0 * inv_det, e1 * inv_det, e2 * inv_det


def triangles_closest(tris, o: V3, d: V3, t_max):
    v = _tri_grid_cols(tris)
    ob = V3(o.x[:, None], o.y[:, None], o.z[:, None])
    db = V3(d.x[:, None], d.y[:, None], d.z[:, None])
    hit, t, _, _, _ = _watertight(v["v0"], v["v1"], v["v2"], ob, db,
                                  t_max[:, None])
    tm = jnp.where(hit, t, jnp.inf)
    idx = jnp.argmin(tm, axis=-1).astype(jnp.int32)
    best = jnp.min(tm, axis=-1)
    return jnp.isfinite(best), best, idx


def triangles_anyhit(tris, o: V3, d: V3, t_max):
    v = _tri_grid_cols(tris)
    ob = V3(o.x[:, None], o.y[:, None], o.z[:, None])
    db = V3(d.x[:, None], d.y[:, None], d.z[:, None])
    hit, _, _, _, _ = _watertight(v["v0"], v["v1"], v["v2"], ob, db,
                                  t_max[:, None])
    return jnp.any(hit, axis=-1)


# ---------------------------------------------------------------------------
# Detail phase: winner row gather + planar frame build
# ---------------------------------------------------------------------------

_TRI_FIELDS = 27  # 9 verts + 9 normals + 6 uv + has_n + mat_id + flip


def triangle_rows(tris) -> np.ndarray:
    """Host [T, 27] detail row matrix (one gather per winner build);
    material ids ride bitcast to f32 so the gather stays one f32 matrix."""
    t = {k: np.asarray(getattr(tris, k)) for k in (
        "v0", "v1", "v2", "n0", "n1", "n2", "uv0", "uv1", "uv2",
        "has_normals", "material_id", "flip_normal")}
    T_ = t["v0"].shape[0]
    out = np.zeros((max(T_, 1), _TRI_FIELDS), np.float32)
    if T_ == 0:
        return out
    cols = [t["v0"], t["v1"], t["v2"], t["n0"], t["n1"], t["n2"],
            t["uv0"], t["uv1"], t["uv2"]]
    j = 0
    for c in cols:
        out[:, j:j + c.shape[1]] = c
        j += c.shape[1]
    out[:, 24] = t["has_normals"].astype(np.float32)
    out[:, 25] = np.asarray(t["material_id"], np.int32).view(np.float32)
    out[:, 26] = t["flip_normal"].astype(np.float32)
    return out


def _rows_v3(mt, j):
    return V3(mt[j], mt[j + 1], mt[j + 2])


def make_hit_triangles(rows, o: V3, d: V3, time, idx, valid,
                       prim_offset=0) -> HitP:
    """Planar twin of triangle.make_hit (triangle_mesh.jl:125-185,
    216-242). ``rows``: triangle_rows matrix (host or device)."""
    mat = jnp.asarray(rows)[idx]            # [N, 26] one row gather
    mt = jnp.moveaxis(mat, -1, 0)           # [26, N]
    v0, v1, v2 = _rows_v3(mt, 0), _rows_v3(mt, 3), _rows_v3(mt, 6)
    n0, n1, n2 = _rows_v3(mt, 9), _rows_v3(mt, 12), _rows_v3(mt, 15)
    uv0u, uv0v, uv1u, uv1v, uv2u, uv2v = (mt[18], mt[19], mt[20], mt[21],
                                          mt[22], mt[23])
    has_n = mt[24] != 0.0
    material_id = jax.lax.bitcast_convert_type(mt[25], jnp.int32)
    flip = mt[26] != 0.0

    n = o.x.shape[0]
    inf = jnp.full((n,), jnp.inf, F32)
    hit, t, b0, b1, b2 = _watertight(v0, v1, v2, o, d, inf)
    valid = valid & hit

    duv13u, duv13v = uv0u - uv2u, uv0v - uv2v
    duv23u, duv23v = uv1u - uv2u, uv1v - uv2v
    dp13 = v0 - v2
    dp23 = v1 - v2
    uv_det = duv13u * duv23v - duv13v * duv23u
    uv_degen = jnp.abs(uv_det) < 1e-12
    inv_uv_det = 1.0 / jnp.where(uv_degen, 1.0, uv_det)
    dpdu = (dp13 * duv23v - dp23 * duv13v) * inv_uv_det
    dpdv = (dp13 * (-duv23u) + dp23 * duv13u) * inv_uv_det
    ng0 = (v2 - v0).cross(v1 - v0).normalize()
    _, fb_u, fb_v = V.coordinate_system(ng0)
    dpdu = V.where(uv_degen, fb_u, dpdu)
    dpdv = V.where(uv_degen, fb_v, dpdv)

    p = v0 * b0 + v1 * b1 + v2 * b2
    u_ = b0 * uv0u + b1 * uv1u + b2 * uv2u
    v_ = b0 * uv0v + b1 * uv1v + b2 * uv2v

    wo = (-d).normalize()
    # Geometric normal from edge cross product (triangle_mesh.jl:230;
    # the packed path's make_surface_hit n is immediately overwritten by
    # this, shapes/triangle.py make_hit).
    n_geom = dp13.cross(dp23).normalize()

    # Shading geometry from per-vertex normals
    # (set_shading_geometry; interaction.py:82-103).
    ns_interp = n0 * b0 + n1 * b1 + n2 * b2
    ns_len2 = ns_interp.length_squared()
    ns = V.where(ns_len2 > 0, ns_interp.normalize(), n_geom)
    ss0 = dpdu.normalize()
    ts0 = ns.cross(ss0)
    ok = ts0.length_squared() > 0
    ts_n = ts0.normalize()
    ss_n = ts_n.cross(ns)
    _, ss_fb, ts_fb = V.coordinate_system(ns)
    ss = V.where(ok, ss_n, ss_fb)
    ts = V.where(ok, ts_n, ts_fb)

    dn13 = n0 - n2
    dn23 = n1 - n2
    dndu = (dn13 * duv23v - dn23 * duv13v) * inv_uv_det
    dndv = (dn13 * (-duv23u) + dn23 * duv13u) * inv_uv_det
    zero3 = V3.zeros((n,))
    dndu = V.where(uv_degen, zero3, dndu)
    dndv = V.where(uv_degen, zero3, dndv)

    # set_shading_geometry with orientation_is_authoritative=True:
    ns_sh = ss.cross(ts).normalize()
    ns_sh = V.where(flip, -ns_sh, ns_sh)
    n_auth = V.face_forward(n_geom, ns_sh)
    new_n = V.where(has_n, n_auth, n_geom)
    new_ns = V.where(has_n, ns_sh, n_geom)
    s_dpdu = V.where(has_n, ss, dpdu)
    s_dpdv = V.where(has_n, ts, dpdv)
    s_dndu = V.where(has_n, dndu, zero3)
    s_dndv = V.where(has_n, dndv, zero3)

    # Without normals: flip by orientation/handedness
    # (triangle_mesh.jl:238-239).
    flip_plain = (~has_n) & flip
    new_n = V.where(flip_plain, -new_n, new_n)
    new_ns = V.where(flip_plain, -new_ns, new_ns)

    z = jnp.zeros((n,), F32)
    return HitP(
        valid=valid, t=t, p=p, time=time, wo=wo, n=new_n, u=u_, v=v_,
        dpdu=dpdu, dpdv=dpdv, ns=new_ns,
        s_dpdu=s_dpdu, s_dpdv=s_dpdv, s_dndu=s_dndu, s_dndv=s_dndv,
        prim_id=(idx + prim_offset).astype(jnp.int32),
        material_id=material_id,
        dudx=z, dudy=z, dvdx=z, dvdy=z, dpdx=zero3, dpdy=zero3,
    )


_SPH_FIELDS = 32  # w2o 3x4, o2w 3x4, radius, th_min, th_max, phi_max,
#                   mat_id, flip, (2 pad)


def sphere_rows(sph) -> np.ndarray:
    w2o = np.asarray(sph.w2o)
    o2w = np.asarray(sph.o2w)
    S = w2o.shape[0]
    out = np.zeros((max(S, 1), _SPH_FIELDS), np.float32)
    if S == 0:
        return out
    out[:, 0:12] = w2o[:, :3, :].reshape(S, 12)
    out[:, 12:24] = o2w[:, :3, :].reshape(S, 12)
    out[:, 24] = np.asarray(sph.radius)
    out[:, 25] = np.asarray(sph.theta_min)
    out[:, 26] = np.asarray(sph.theta_max)
    out[:, 27] = np.asarray(sph.phi_max)
    out[:, 28] = np.asarray(sph.material_id, np.int32).view(np.float32)
    out[:, 29] = np.asarray(sph.flip_normal).astype(np.float32)
    return out


def make_hit_spheres(rows, o: V3, d: V3, time, t, idx, valid,
                     prim_offset=0) -> HitP:
    """Planar twin of sphere.make_hit (sphere.jl:88-163)."""
    mat = jnp.asarray(rows)[idx]
    mt = jnp.moveaxis(mat, -1, 0)  # [32, N]
    w2o_R = [[mt[0], mt[1], mt[2]], [mt[4], mt[5], mt[6]],
             [mt[8], mt[9], mt[10]]]
    w2o_t = V3(mt[3], mt[7], mt[11])
    o2w_R = [[mt[12], mt[13], mt[14]], [mt[16], mt[17], mt[18]],
             [mt[20], mt[21], mt[22]]]
    o2w_t = V3(mt[15], mt[19], mt[23])
    radius, th_min, th_max, phi_max = mt[24], mt[25], mt[26], mt[27]
    material_id = jax.lax.bitcast_convert_type(mt[28], jnp.int32)
    flip = mt[29] != 0.0

    o_obj = V.mat3_apply(w2o_R, o) + w2o_t
    d_obj = V.mat3_apply(w2o_R, d)
    p = _refine_p(o_obj + d_obj * t, radius)
    phi = _phi_of(p)

    u = phi / phi_max
    theta = jnp.arccos(jnp.clip(p.z / radius, -1.0, 1.0))
    v = (theta - th_min) / (th_max - th_min)

    z_radius = jnp.sqrt(p.x * p.x + p.y * p.y)
    inv_zr = 1.0 / jnp.maximum(z_radius, 1e-20)
    cos_phi = p.x * inv_zr
    sin_phi = p.y * inv_zr

    n = o.x.shape[0]
    zeros = jnp.zeros((n,), F32)
    dpdu = V3(-phi_max * p.y, phi_max * p.x, zeros)
    dtheta = th_max - th_min
    dpdv = V3(p.z * cos_phi, p.z * sin_phi, -radius * jnp.sin(theta)) * dtheta

    d2pduu = V3(p.x, p.y, zeros) * (-phi_max * phi_max)
    d2pduv = V3(-sin_phi, cos_phi, zeros) * (dtheta * p.z * phi_max)
    d2pdvv = -p * (dtheta * dtheta)
    E = dpdu.dot(dpdu)
    Fc = dpdu.dot(dpdv)
    G = dpdv.dot(dpdv)
    n_obj = dpdu.cross(dpdv).normalize()
    e = n_obj.dot(d2pduu)
    f = n_obj.dot(d2pduv)
    g2 = n_obj.dot(d2pdvv)
    inv_egf = 1.0 / jnp.maximum(E * G - Fc * Fc, 1e-20)
    dndu = dpdu * ((f * Fc - e * G) * inv_egf) + dpdv * (
        (e * Fc - f * E) * inv_egf)
    dndv = dpdu * ((g2 * Fc - f * G) * inv_egf) + dpdv * (
        (f * Fc - g2 * E) * inv_egf)

    p_w = V.mat3_apply(o2w_R, p) + o2w_t
    dpdu_w = V.mat3_apply(o2w_R, dpdu)
    dpdv_w = V.mat3_apply(o2w_R, dpdv)
    # Normals transform through the inverse transpose = w2o^T.
    dndu_w = V.mat3_apply_t(w2o_R, dndu)
    dndv_w = V.mat3_apply_t(w2o_R, dndv)

    wo = (-d).normalize()
    n_w = dpdu_w.cross(dpdv_w).normalize()
    n_w = V.where(flip, -n_w, n_w)
    zero3 = V3.zeros((n,))
    return HitP(
        valid=valid, t=t, p=p_w, time=time, wo=wo, n=n_w, u=u, v=v,
        dpdu=dpdu_w, dpdv=dpdv_w, ns=n_w,
        s_dpdu=dpdu_w, s_dpdv=dpdv_w, s_dndu=dndu_w, s_dndv=dndv_w,
        prim_id=(idx + prim_offset).astype(jnp.int32),
        material_id=material_id,
        dudx=zeros, dudy=zeros, dvdx=zeros, dvdy=zeros,
        dpdx=zero3, dpdy=zero3,
    )


# ---------------------------------------------------------------------------
# Screen-space differentials (planar twin of
# core.interaction.compute_differentials)
# ---------------------------------------------------------------------------


def compute_differentials(hit: HitP, rd: RayP) -> HitP:
    n, p = hit.n, hit.p
    d = -n.dot(p)
    tx = (-n.dot(rd.rx_origin) - d) / n.dot(rd.rx_direction)
    ty = (-n.dot(rd.ry_origin) - d) / n.dot(rd.ry_direction)
    px = rd.rx_origin + rd.rx_direction * tx
    py = rd.ry_origin + rd.ry_direction * ty
    dpdx = px - p
    dpdy = py - p

    an = n.abs()
    use_yz = (an.x > an.y) & (an.x > an.z)
    use_xz = (~use_yz) & (an.y > an.z)

    def pick(v: V3, which):
        # which: 0 -> (d0=y if use_yz else x); encoded by the two masks
        if which == 0:
            return jnp.where(use_yz, v.y, v.x)
        return jnp.where(use_yz | use_xz, v.z, v.y)

    a00 = pick(hit.dpdu, 0)
    a01 = pick(hit.dpdv, 0)
    a10 = pick(hit.dpdu, 1)
    a11 = pick(hit.dpdv, 1)
    det = a00 * a11 - a01 * a10
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0,
                        1.0 / jnp.where(det == 0, 1.0, det))
    bx0 = pick(px, 0) - pick(p, 0)
    bx1 = pick(px, 1) - pick(p, 1)
    by0 = pick(py, 0) - pick(p, 0)
    by1 = pick(py, 1) - pick(p, 1)
    dudx = (a11 * bx0 - a01 * bx1) * inv_det
    dvdx = (a00 * bx1 - a10 * bx0) * inv_det
    dudy = (a11 * by0 - a01 * by1) * inv_det
    dvdy = (a00 * by1 - a10 * by0) * inv_det

    has = rd.has_differentials
    fin = lambda v: jnp.where(has & jnp.isfinite(v), v, 0.0)
    fin3 = lambda v: V3(fin(v.x), fin(v.y), fin(v.z))
    return hit._replace(
        dudx=fin(dudx), dvdx=fin(dvdx), dudy=fin(dudy), dvdy=fin(dvdy),
        dpdx=fin3(dpdx), dpdy=fin3(dpdy),
    )
