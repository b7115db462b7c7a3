"""Planar path tracer (NEE + MIS) — config 2's hot path.

Twin of integrators/path.py (itself beyond the reference — SURVEY §5:
no area lights / path tracing there) in the planar component layout.
Light handling is specialized to what the planar light module does
statically: scenes with ONE light (any supported kind), or multiple
all-delta lights with a uniform per-lane pick unrolled over static
indices. Everything else (env maps, many area lights) falls back to the
packed li via supports(). The PRNG derivation matches the packed path
column for column, so tests pin the two implementations together.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..bxdf import lobes as lb
from ..core import vec as V
from ..core.ray import SPAWN_EPS
from ..core.vec import V3
from ..lights import lights as L
from ..sampler import uniform as U
from . import geom as G
from . import lights as WL
from . import materials as WM
from . import shade as S
from . import whitted as WW

F32 = jnp.float32


def supports(scene) -> bool:
    if not WW.supports(scene):
        return False
    host = scene.lights_host
    kinds = [int(k) for k in np.asarray(host.kind)]
    if len(kinds) == 0:
        return True
    if len(kinds) == 1:
        return True
    return all(k in (L.POINT, L.SPOT, L.DISTANT) for k in kinds)


def to_y(c: V3):
    return 0.212671 * c.x + 0.715160 * c.y + 0.072169 * c.z


def power_heuristic(nf, f_pdf, ng, g_pdf):
    f = (nf * f_pdf) ** 2
    g = (ng * g_pdf) ** 2
    return jnp.where(f + g > 0, f / (f + g), 0.0)


def _estimate_direct_static(scene, j: int, hit: G.HitP, lobes: S.LobesP,
                            u_l0, u_l1, u_s0, u_s1,
                            flags=lb.BSDF_ALL & ~lb.BSDF_SPECULAR) -> V3:
    """common.estimate_direct twin at a STATIC light index: MIS
    light-sampling leg always, BSDF-sampling leg only for AREA lights
    (env is gated out by supports)."""
    host = scene.lights_host
    kind = WL.kind_of(scene, j)
    delta = bool(np.asarray(L.is_delta(host))[j])
    n = hit.t.shape[0]

    radiance, wi, light_pdf, p_light = WL.sample_li_static(
        scene, j, hit.p, u_l0, u_l1)
    f_val = S.f(lobes, hit.wo, wi, flags) * jnp.abs(wi.dot(hit.ns))
    scatter_pdf = S.compute_pdf(lobes, hit.wo, wi, flags)
    ok = ((light_pdf > 0) & ~radiance.is_black() & ~f_val.is_black()
          & hit.valid)
    vis = WW.unoccluded(scene, hit.p, p_light, n_geom=hit.n) & ok
    if delta:
        w_l = jnp.ones((n,), F32)
    else:
        w_l = power_heuristic(1.0, light_pdf, 1.0, scatter_pdf)
    ld = V.where(
        vis, f_val * radiance * (w_l / jnp.maximum(light_pdf, 1e-20)), 0.0)

    if kind == L.AREA:
        bs = S.sample_f(lobes, hit.wo, u_s0, u_s1, flags)
        spec_sample = (bs.sampled_flags & lb.BSDF_SPECULAR) != 0
        f_b = bs.f * jnp.abs(bs.wi.dot(hit.ns))
        go = hit.valid & (bs.pdf > 0) & ~f_b.is_black()
        o = _offset_origin(hit.p, bs.wi, hit.n)
        hit2 = WW.closest_hit(scene, o, bs.wi,
                              jnp.full((n,), jnp.inf, F32), hit.time)
        cos_l = hit2.n.dot(-bs.wi)
        total_area = float(np.asarray(host.total_area)[j])
        d2 = hit2.t * hit2.t * bs.wi.length_squared()
        li_pdf = d2 / jnp.maximum(
            jnp.abs(cos_l) * max(total_area, 1e-20), 1e-20)
        li_pdf = jnp.where(jnp.abs(cos_l) > 1e-9, li_pdf, 0.0)
        tri_idx = jnp.clip(hit2.prim_id - scene.n_spheres, 0,
                           max(scene.n_triangles - 1, 0))
        is_flat = (hit2.prim_id >= scene.n_spheres) & (
            hit2.prim_id < scene.n_spheres + scene.n_triangles)
        hits_light = (hit2.valid & is_flat
                      & (jnp.asarray(scene.tri_light_id)[tri_idx] == j))
        i_rgb = jnp.asarray(scene.lights.i)[j]
        two = bool(np.asarray(host.two_sided)[j])
        front = hit2.n.dot(-bs.wi) > 0
        emits = jnp.ones_like(front) if two else front
        le = V.where(
            hits_light & emits,
            V3(jnp.broadcast_to(i_rgb[0], (n,)),
               jnp.broadcast_to(i_rgb[1], (n,)),
               jnp.broadcast_to(i_rgb[2], (n,))), 0.0)
        w_b = jnp.where(spec_sample, 1.0,
                        power_heuristic(1.0, bs.pdf, 1.0, li_pdf))
        lb_leg = V.where(
            go & hits_light,
            f_b * le * (w_b / jnp.maximum(bs.pdf, 1e-20)), 0.0)
        ld = ld + lb_leg
    return ld


def _offset_origin(p: V3, d: V3, n_geom: V3) -> V3:
    """common.offset_ray_origin twin."""
    o = p + d * SPAWN_EPS
    scale = 1e-4 * jnp.maximum(1.0, p.abs().max_component())
    side = jnp.sign(n_geom.dot(d))
    return o + n_geom * (scale * side)


def uniform_sample_one_light(scene, hit: G.HitP, lobes: S.LobesP, keys,
                             light_cdf=None) -> V3:
    """common.uniform_sample_one_light twin (same 5-column uniform row
    derivation). Static unroll over light indices; the per-lane pick
    masks between static estimates (n_lights is small by supports())."""
    n = hit.t.shape[0]
    n_lights = WL.light_count(scene)
    if n_lights == 0:
        return V3.zeros((n,))
    row = U.uniform_lanes(U.ensure_lane_keys(keys, n), 5)
    rt = jnp.moveaxis(row, -1, 0)
    u_pick, u_l0, u_l1, u_s0, u_s1 = rt[0], rt[1], rt[2], rt[3], rt[4]
    if light_cdf is None:
        idx = jnp.minimum((u_pick * n_lights).astype(jnp.int32),
                          n_lights - 1)
        pmf = jnp.full((n,), 1.0 / n_lights, F32)
    else:
        cdf = jnp.asarray(light_cdf)
        idx = jnp.sum((cdf[None, :] < u_pick[:, None]).astype(jnp.int32),
                      axis=1)
        idx = jnp.minimum(idx, n_lights - 1)
        prev = jnp.concatenate([jnp.zeros(1, F32), cdf[:-1]])
        pmf = (cdf - prev)[idx]
    total = V3.zeros((n,))
    for j in range(n_lights):
        ld_j = _estimate_direct_static(scene, j, hit, lobes,
                                       u_l0, u_l1, u_s0, u_s1)
        total = V.where(idx == j, ld_j, total)
    return total / jnp.maximum(pmf, 1e-12)


def li(scene, rd, key, max_depth: int = 5, rr_depth: int = 3,
       return_aux: bool = False):
    """Planar path-traced radiance (integrators/path.li twin)."""
    n = rd.o.shape[0]
    keys = U.ensure_lane_keys(key, n)
    rp = G.RayP.of(rd)

    zf = rp.o.x * 0.0
    zb = zf != 0.0

    def body(bounce, carry):
        (ox, oy, oz, dx, dy, dz, time, br, bg, bb, active,
         specular_bounce, lr, lg, lbv, useful) = carry
        o = V3(ox, oy, oz)
        d = V3(dx, dy, dz)
        beta = V3(br, bg, bb)
        l_out = V3(lr, lg, lbv)
        k = U.fold_lanes(keys, bounce)
        hit = WW.closest_hit(scene, o, d, jnp.full((n,), jnp.inf, F32),
                             time)
        live = active & hit.valid
        useful = (useful + jnp.sum(active.astype(jnp.int32))
                  + 2 * jnp.sum(live.astype(jnp.int32)))

        count_le = live & ((bounce == 0) | specular_bounce)
        le = WL.area_light_radiance(scene, hit, hit.wo)
        l_out = l_out + V.where(count_le, beta * le, 0.0)

        hit = hit._replace(valid=live)
        lobes = WM.compute_scattering(
            scene.materials, hit, allow_multiple_lobes=True,
            mode=lb.RADIANCE)

        ld = uniform_sample_one_light(scene, hit, lobes,
                                      U.fold_lanes(k, 0))
        l_out = l_out + V.where(live, beta * ld, 0.0)

        u0, u1 = WW.uniform2(U.fold_lanes(k, 1))
        bs = S.sample_f(lobes, hit.wo, u0, u1, lb.BSDF_ALL)
        ok = live & (bs.pdf > 0) & ~bs.f.is_black()
        specular_bounce = jnp.where(
            ok, (bs.sampled_flags & lb.BSDF_SPECULAR) != 0,
            specular_bounce)
        beta_next = V.where(
            ok,
            beta * bs.f * (jnp.abs(bs.wi.dot(hit.ns))
                           / jnp.maximum(bs.pdf, 1e-20)),
            beta)

        q = jnp.maximum(0.05, 1.0 - to_y(beta_next))
        u_rr = U.uniform_lanes(U.fold_lanes(k, 2), 1)[:, 0]
        do_rr = bounce >= rr_depth
        killed = do_rr & (u_rr < q)
        beta_next = V.where(
            do_rr & ~killed,
            beta_next / jnp.maximum(1.0 - q, 1e-6), beta_next)
        beta = V.where(ok, beta_next, beta)

        active = ok & ~killed
        o_next = V.where(active, hit.p + bs.wi * SPAWN_EPS, o)
        d_next = V.where(active, bs.wi, d)
        time = jnp.where(active, hit.time, time)
        return (o_next.x, o_next.y, o_next.z,
                d_next.x, d_next.y, d_next.z, time,
                beta.x, beta.y, beta.z, active, specular_bounce,
                l_out.x, l_out.y, l_out.z, useful)

    ones = 1.0 + zf
    carry = (rp.o.x, rp.o.y, rp.o.z, rp.d.x, rp.d.y, rp.d.z,
             rp.time, ones, ones, ones,
             jnp.ones((n,), bool) ^ zb, jnp.zeros((n,), bool) ^ zb,
             zf, zf, zf, jnp.sum(zf).astype(jnp.int32))
    carry = jax.lax.fori_loop(0, max_depth, body, carry)
    l_out = jnp.moveaxis(jnp.stack([carry[12], carry[13], carry[14]],
                                   axis=0), 0, -1)
    if return_aux:
        return l_out, {"queue_drops": carry[15] * 0,
                       "useful_rays": carry[15]}
    return l_out
