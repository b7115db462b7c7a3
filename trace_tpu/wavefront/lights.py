"""Planar light sampling for the wavefront hot path.

Twin of lights/lights.py sample_li (reference point.jl:50-57,
spot.jl:24-42, directional.jl:39-47) with one structural difference:
the Whitted direct-lighting loop visits lights at STATIC indices
(common.sum_over_lights iterates Python-side), so the per-light
dispatch — which kind, which triangle range — reads the scene's HOST
light-table snapshot (scene.lights_host; per-scene static), while the
numeric parameters (position, intensity, frame) read the LIVE
scene.lights, which render passes thread through as traced arguments
for animated-relight executable reuse (Scene.with_lights). Environment
(INFINITE) lights are not handled here — scenes with one fall back to
the packed li (wavefront/whitted.supports gate), keeping behavior
identical.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import vec as V
from ..core.vec import V3
from ..lights import lights as L

F32 = jnp.float32


def light_count(scene) -> int:
    return int(np.asarray(scene.lights_host.kind).shape[0])


def kind_of(scene, j: int) -> int:
    return int(np.asarray(scene.lights_host.kind)[j])


def _spot_falloff(w2l, ctw, cfs, w: V3):
    """spot falloff delta^4 (spot.jl:33-42); w2l [4,4], ctw/cfs scalars
    (host floats or traced)."""
    wl = V3(
        w2l[0, 0] * w.x + w2l[0, 1] * w.y + w2l[0, 2] * w.z,
        w2l[1, 0] * w.x + w2l[1, 1] * w.y + w2l[1, 2] * w.z,
        w2l[2, 0] * w.x + w2l[2, 1] * w.y + w2l[2, 2] * w.z,
    )
    cos_t = wl.normalize().z
    d = (cos_t - ctw) / jnp.maximum(cfs - ctw, 1e-12)
    f = jnp.clip(d, 0.0, 1.0) ** 4
    f = jnp.where(cos_t < ctw, 0.0, f)
    return jnp.where(cos_t >= cfs, 1.0, f)


def sample_li_static(scene, j: int, p_ref: V3, u0, u1):
    """sample_li for the static light index ``j``.

    Returns (radiance V3, wi V3, pdf [N], p_light V3)."""
    lights = scene.lights  # live (possibly traced) numeric params
    kind = kind_of(scene, j)
    n = p_ref.x.shape[0]
    i_rgb = jnp.asarray(lights.i)[j]

    if kind in (L.POINT, L.SPOT):
        pl = jnp.asarray(lights.p)[j]
        p_light = V3(jnp.broadcast_to(pl[0], (n,)),
                     jnp.broadcast_to(pl[1], (n,)),
                     jnp.broadcast_to(pl[2], (n,)))
        to_l = p_light - p_ref
        dist2 = jnp.maximum(to_l.length_squared(), 1e-20)
        inv_d = 1.0 / jnp.sqrt(dist2)
        wi = to_l * inv_d
        inv2 = 1.0 / dist2
        rad = V3(i_rgb[0] * inv2, i_rgb[1] * inv2, i_rgb[2] * inv2)
        if kind == L.SPOT:
            fo = _spot_falloff(
                jnp.asarray(lights.w2l)[j],
                jnp.asarray(lights.cos_total_width)[j],
                jnp.asarray(lights.cos_falloff_start)[j], -wi)
            rad = rad * fo
        return rad, wi, jnp.ones((n,), F32), p_light

    if kind == L.DISTANT:
        dirn = jnp.asarray(lights.direction)[j]
        wr = jnp.asarray(lights.world_radius)
        wi = V3(jnp.broadcast_to(dirn[0], (n,)),
                jnp.broadcast_to(dirn[1], (n,)),
                jnp.broadcast_to(dirn[2], (n,)))
        p_light = p_ref + wi * (2.0 * wr)
        rad = V3(jnp.broadcast_to(i_rgb[0], (n,)),
                 jnp.broadcast_to(i_rgb[1], (n,)),
                 jnp.broadcast_to(i_rgb[2], (n,)))
        return rad, wi, jnp.ones((n,), F32), p_light

    if kind == L.AREA:
        host = scene.lights_host
        tri_start = int(np.asarray(host.tri_start)[j])
        tri_count = int(np.asarray(host.tri_count)[j])
        total_area = float(np.asarray(host.total_area)[j])
        two_sided = bool(np.asarray(host.two_sided)[j])
        p_a, n_a = _sample_area_point_static(
            scene, tri_start, tri_count, u0, u1)
        to_a = p_a - p_ref
        d2_a = jnp.maximum(to_a.length_squared(), 1e-20)
        wi_a = to_a * (1.0 / jnp.sqrt(d2_a))
        cos_l = n_a.dot(-wi_a)
        if two_sided:
            emits = jnp.abs(cos_l) > 1e-9
        else:
            emits = cos_l > 1e-9
        pdf_a = d2_a / jnp.maximum(
            jnp.abs(cos_l) * max(total_area, 1e-20), 1e-20)
        rad = V.where(
            emits,
            V3(jnp.broadcast_to(i_rgb[0], (n,)),
               jnp.broadcast_to(i_rgb[1], (n,)),
               jnp.broadcast_to(i_rgb[2], (n,))), 0.0)
        return rad, wi_a, pdf_a, p_a

    raise NotImplementedError(f"planar sample_li: light kind {kind}")


def _sample_area_point_static(scene, tri_start: int, tri_count: int, u0, u1):
    """lights._sample_area_point with a STATIC triangle window: the
    windowed area CDF is precomputed on host (planar path requires host
    triangle tables — wavefront/whitted.supports); sampling is one scan
    + a single [M, 10]-row vertex gather."""
    tris = scene.triangles_host
    v0 = np.asarray(tris.v0)[tri_start:tri_start + tri_count]
    v1 = np.asarray(tris.v1)[tri_start:tri_start + tri_count]
    v2 = np.asarray(tris.v2)[tri_start:tri_start + tri_count]
    flip = np.asarray(tris.flip_normal)[tri_start:tri_start + tri_count]
    c = np.cross(v1 - v0, v2 - v0)
    areas = 0.5 * np.sqrt((c * c).sum(-1)).astype(np.float32)
    cdf = (np.cumsum(areas) / max(areas.sum(), 1e-20)).astype(np.float32)

    m = tri_count
    pick = jnp.sum(
        (jnp.asarray(cdf)[None, :] < u0[:, None]).astype(jnp.int32), axis=1)
    pick = jnp.clip(pick, 0, m - 1)
    lo_t = jnp.concatenate([jnp.zeros(1, F32), jnp.asarray(cdf[:-1])])
    lo = lo_t[pick]
    hi = jnp.asarray(cdf)[pick]
    u0r = jnp.clip((u0 - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)

    rows = np.concatenate(
        [v0, v1, v2, flip[:, None].astype(np.float32)], axis=1)  # [M, 10]
    g = jnp.asarray(rows)[pick]
    gt = jnp.moveaxis(g, -1, 0)
    gv0 = V3(gt[0], gt[1], gt[2])
    gv1 = V3(gt[3], gt[4], gt[5])
    gv2 = V3(gt[6], gt[7], gt[8])
    gflip = gt[9] != 0.0

    su0 = jnp.sqrt(u0r)
    b0 = 1.0 - su0
    b1 = u1 * su0
    p_l = gv0 * (1.0 - b0 - b1) + gv1 * b0 + gv2 * b1
    n_l = (gv1 - gv0).cross(gv2 - gv0).normalize()
    n_l = V.where(gflip, -n_l, n_l)
    return p_l, n_l


def area_light_radiance(scene, hit, wo: V3) -> V3:
    """scene.area_light_radiance twin on planar state. Emission rides
    the LIVE light table (relightable); kinds/two_sided ride host."""
    n = hit.t.shape[0]
    if scene.max_area_tris == 0 or scene.n_triangles == 0:
        return V3.zeros((n,))
    tri_idx = jnp.clip(hit.prim_id - scene.n_spheres, 0,
                       scene.n_triangles - 1)
    is_flat_tri = (hit.prim_id >= scene.n_spheres) & (
        hit.prim_id < scene.n_spheres + scene.n_triangles)
    lid = jnp.where(hit.valid & is_flat_tri,
                    jnp.asarray(scene.tri_light_id)[tri_idx], -1)
    host = scene.lights_host
    li_rows = jnp.concatenate([
        jnp.asarray(scene.lights.i, F32),
        jnp.asarray(np.asarray(host.kind, np.float32))[:, None],
        jnp.asarray(np.asarray(host.two_sided, np.float32))[:, None],
    ], axis=1)
    g = li_rows[jnp.maximum(lid, 0)]
    gt = jnp.moveaxis(g, -1, 0)
    i_rgb = V3(gt[0], gt[1], gt[2])
    is_area = gt[3] == float(L.AREA)
    two = gt[4] != 0.0
    front = hit.n.dot(wo) > 0
    emits = jnp.where(two, True, front)
    return V.where((lid >= 0) & is_area & emits, i_rgb, 0.0)


def sample_le_static(scene, j: int, u0x, u0y, u1x, u1y, time):
    """lights.sample_le twin at a STATIC light index (photon emission,
    point.jl:61-69, spot.jl:44-55; distant/area as in the packed path).
    Returns (le V3, o V3, d V3, n_light V3, pdf_pos [N], pdf_dir [N])."""
    lights = scene.lights
    kind = kind_of(scene, j)
    n = u0x.shape[0]
    i_rgb = jnp.asarray(lights.i)[j]
    i_v = V3(jnp.broadcast_to(i_rgb[0], (n,)),
             jnp.broadcast_to(i_rgb[1], (n,)),
             jnp.broadcast_to(i_rgb[2], (n,)))
    ones = jnp.ones((n,), F32)

    if kind == L.POINT:
        d = V.uniform_sample_sphere(u0x, u0y)
        pl = jnp.asarray(lights.p)[j]
        o = V3(jnp.broadcast_to(pl[0], (n,)), jnp.broadcast_to(pl[1], (n,)),
               jnp.broadcast_to(pl[2], (n,)))
        pdf_dir = ones * np.float32(1.0 / (4.0 * np.pi))
        return i_v, o, d, d, ones, pdf_dir

    if kind == L.SPOT:
        ctw = jnp.asarray(lights.cos_total_width)[j]
        cfs = jnp.asarray(lights.cos_falloff_start)[j]
        d_cone = V.uniform_sample_cone(u0x, u0y, ctw)
        l2w = jnp.asarray(lights.l2w)[j]
        d = V3(
            l2w[0, 0] * d_cone.x + l2w[0, 1] * d_cone.y
            + l2w[0, 2] * d_cone.z,
            l2w[1, 0] * d_cone.x + l2w[1, 1] * d_cone.y
            + l2w[1, 2] * d_cone.z,
            l2w[2, 0] * d_cone.x + l2w[2, 1] * d_cone.y
            + l2w[2, 2] * d_cone.z,
        ).normalize()
        pl = jnp.asarray(lights.p)[j]
        o = V3(jnp.broadcast_to(pl[0], (n,)), jnp.broadcast_to(pl[1], (n,)),
               jnp.broadcast_to(pl[2], (n,)))
        fo = _spot_falloff(jnp.asarray(lights.w2l)[j], ctw, cfs, d)
        le = i_v * fo
        pdf_dir = jnp.broadcast_to(
            1.0 / (2.0 * np.float32(np.pi) * (1.0 - ctw)), (n,))
        return le, o, d, d, ones, pdf_dir

    if kind == L.DISTANT:
        dirn = jnp.asarray(lights.direction)[j]
        wc = jnp.asarray(lights.world_center)
        wr = jnp.asarray(lights.world_radius)
        dv = V3(jnp.broadcast_to(dirn[0], (n,)),
                jnp.broadcast_to(dirn[1], (n,)),
                jnp.broadcast_to(dirn[2], (n,)))
        _, v1, v2 = V.coordinate_system(dv)
        cdx, cdy = V.concentric_sample_disk(u0x, u0y)
        wc_v = V3(jnp.broadcast_to(wc[0], (n,)),
                  jnp.broadcast_to(wc[1], (n,)),
                  jnp.broadcast_to(wc[2], (n,)))
        o = wc_v + (v1 * cdx + v2 * cdy) * wr + dv * wr
        d = -dv
        pdf_pos = jnp.broadcast_to(
            1.0 / jnp.maximum(np.float32(np.pi) * wr * wr, 1e-20), (n,))
        return i_v, o, d, d, pdf_pos, ones

    if kind == L.AREA:
        host = scene.lights_host
        total_area = float(np.asarray(host.total_area)[j])
        two = bool(np.asarray(host.two_sided)[j])
        p_a, n_a = _sample_area_point_static(
            scene, int(np.asarray(host.tri_start)[j]),
            int(np.asarray(host.tri_count)[j]), u0x, u0y)
        if two:
            back = u1x < 0.5
            u1x_r = jnp.minimum(
                jnp.where(back, u1x * 2.0, (u1x - 0.5) * 2.0), 1.0 - 1e-7)
        else:
            back = jnp.zeros((n,), bool)
            u1x_r = u1x
        w_local = V.cosine_sample_hemisphere(u1x_r, u1y)
        wz = jnp.where(back, -w_local.z, w_local.z)
        _, t1, t2 = V.coordinate_system(n_a)
        d = t1 * w_local.x + t2 * w_local.y + n_a * wz
        pdf_pos = jnp.broadcast_to(
            np.float32(1.0 / max(total_area, 1e-20)), (n,))
        pdf_dir = jnp.abs(wz) * np.float32(1.0 / np.pi) * (
            np.float32(0.5) if two else np.float32(1.0))
        return i_v, p_a, d, n_a, pdf_pos, pdf_dir

    raise NotImplementedError(f"planar sample_le: light kind {kind}")
