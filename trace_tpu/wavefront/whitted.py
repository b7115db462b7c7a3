"""Planar Whitted wavefront: the round-5 hot-path rewrite.

Semantics are integrators/whitted.py's li (reference sampler.jl:58-199)
with the state held in the planar component layout (core/vec.py): every
intermediate is a flat [N] op at full lane occupancy, compaction is one
row-matrix gather, and the lobe table is a static tuple sized by the
scene's materials. Equality vs the packed li is pinned by
tests/test_wavefront_equiv.py (same scenes, same keys).

Gates: scenes with an environment light or instanced geometry fall back
to the packed li (integrators/whitted.py dispatches) — those paths keep
their packed implementations this round.

Queue-capacity schedule: ``level_caps`` optionally shrinks the queue at
deeper levels (after level 1 only lanes that spawned specular children
are live). Overflow drops are COUNTED (aux "queue_drops"), so a
shrunken schedule is verified energy-exact post-hoc by drops == 0 —
the useful-ray lever VERDICT r4 #4 asks for, without silent loss.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..bxdf import lobes as lb
from ..core import vec as V
from ..core.ray import SPAWN_EPS
from ..core.vec import V3
from ..sampler import uniform as U
from . import geom as G
from . import lights as WL
from . import materials as WM
from . import shade as S

F32 = jnp.float32


def supports(scene) -> bool:
    """Can the planar path run this scene? Falls back to the packed li
    for: environment lights, instanced geometry, animated-geometry
    views (traced triangle tables — detail rows here are host-built),
    and unsupported material classes."""
    from ..lights import lights as L

    host = getattr(scene, "lights_host", None)
    if host is None or L.has_env(host):
        return False
    if scene.instanced:
        return False
    if scene.n_triangles and not isinstance(scene.triangles.v0, np.ndarray):
        return False  # animated-geometry view: planar detail rows are host
    kinds = set(int(k) for k in np.asarray(host.kind))
    if not kinds <= {L.POINT, L.SPOT, L.DISTANT, L.AREA}:
        return False
    for m in scene.materials:
        if not isinstance(m, (WM.M.MatteMaterial, WM.M.MirrorMaterial,
                              WM.M.GlassMaterial, WM.M.PlasticMaterial,
                              WM.M.MetalMaterial)):
            return False
    return True


def uniform2(keys):
    u = U.uniform_lanes(keys, 2)
    ut = jnp.moveaxis(u, -1, 0)
    return ut[0], ut[1]


def sanitize(v: V3) -> V3:
    f = lambda x: jnp.maximum(jnp.where(jnp.isfinite(x), x, 0.0), 0.0)
    return V3(f(v.x), f(v.y), f(v.z))


# ---------------------------------------------------------------------------
# Scene intersection on planar state
# ---------------------------------------------------------------------------


def closest_hit(scene, o: V3, d: V3, t_max, time) -> G.HitP:
    """scene.intersect twin -> HitP. Cheap phase: planar brute force for
    accel-less scenes, the scene's accelerator otherwise (its [N, C]
    grid / Pallas internals are already full-occupancy); detail phase:
    planar row-matrix winner builds, sources where-merged with the
    packed path's earlier-source tie rule."""
    n = o.x.shape[0]
    if scene.accel is not None:
        op, dp = o.arr(), d.arr()
        (h_s, t_s, i_s), (h_t, t_t, i_t) = scene.accel.closest(
            scene, op, dp, t_max)
    else:
        if scene.n_spheres:
            h_s, t_s, i_s = G.spheres_closest(scene.spheres_host, o, d, t_max)
        else:
            h_s = jnp.zeros(n, bool)
            t_s = jnp.full(n, jnp.inf, F32)
            i_s = jnp.zeros(n, jnp.int32)
        if scene.n_triangles:
            h_t, t_t, i_t = G.triangles_closest(
                scene.triangles_host, o, d, t_max)
        else:
            h_t = jnp.zeros(n, bool)
            t_t = jnp.full(n, jnp.inf, F32)
            i_t = jnp.zeros(n, jnp.int32)

    if not scene.n_spheres and not scene.n_triangles:
        return G.empty_hitp(n)

    ts = jnp.where(h_s, t_s, jnp.inf)
    tt = jnp.where(h_t, t_t, jnp.inf)
    tri_wins = h_t & (tt < ts)  # ties break to the earlier source
    if scene.n_spheres:
        rec = G.make_hit_spheres(
            _sphere_rows(scene), o, d, time, t_s, i_s, h_s & ~tri_wins)
    else:
        rec = None
    if scene.n_triangles:
        rec_t = G.make_hit_triangles(
            _triangle_rows(scene), o, d, time, i_t, tri_wins,
            prim_offset=scene.n_spheres)
        if rec is None:
            rec = rec_t
        else:
            rec = jax.tree.map(
                lambda a, b: jnp.where(tri_wins, a, b), rec_t, rec)
    return rec


def any_hit(scene, o: V3, d: V3, t_max):
    """scene.intersect_p twin (shadow rays)."""
    if scene.accel is not None:
        return scene.accel.any_hit(scene, o.arr(), d.arr(), t_max)
    n = o.x.shape[0]
    occ = jnp.zeros(n, bool)
    if scene.n_spheres:
        occ = occ | G.spheres_anyhit(scene.spheres_host, o, d, t_max)
    if scene.n_triangles:
        occ = occ | G.triangles_anyhit(scene.triangles_host, o, d, t_max)
    return occ


def _sphere_rows(scene):
    rows = getattr(scene, "_wavefront_sphere_rows", None)
    if rows is None:
        rows = G.sphere_rows(scene.spheres_host)
        scene._wavefront_sphere_rows = rows
    return rows


def _triangle_rows(scene):
    rows = getattr(scene, "_wavefront_triangle_rows", None)
    if rows is None:
        rows = G.triangle_rows(scene.triangles_host)
        scene._wavefront_triangle_rows = rows
    return rows


def unoccluded(scene, p0: V3, p1: V3, n_geom: V3 | None = None):
    """scene.unoccluded twin: shadow ray with the scale-aware nudge."""
    d = p1 - p0
    o = p0 + d * SPAWN_EPS
    if n_geom is not None:
        scale = 1e-4 * jnp.maximum(1.0, p0.abs().max_component())
        side = jnp.sign(n_geom.dot(d))
        o = o + n_geom * (scale * side)
    n = p0.x.shape[0]
    t_max = jnp.full((n,), 1.0 - 1e-4, F32)
    return ~any_hit(scene, o, d, t_max)


# ---------------------------------------------------------------------------
# Direct lighting (common.sum_over_lights twin)
# ---------------------------------------------------------------------------


def sum_over_lights(scene, hit: G.HitP, lobes: S.LobesP, keys,
                    flags=lb.BSDF_ALL & ~lb.BSDF_SPECULAR) -> V3:
    n = hit.t.shape[0]
    total = V3.zeros((n,))
    for j in range(WL.light_count(scene)):
        u0, u1 = uniform2(U.fold_lanes(keys, j))
        radiance, wi, pdf, p_light = WL.sample_li_static(
            scene, j, hit.p, u0, u1)
        f_val = S.f(lobes, hit.wo, wi, flags)
        contrib_possible = (~radiance.is_black() & (pdf > 0)
                            & ~f_val.is_black())
        vis = unoccluded(scene, hit.p, p_light, n_geom=hit.n)
        vis = vis & contrib_possible & hit.valid
        contrib = f_val * radiance * (
            jnp.abs(wi.dot(hit.ns)) / jnp.maximum(pdf, 1e-20))
        total = total + V.where(vis, contrib, 0.0)
    return total


# ---------------------------------------------------------------------------
# Specular children (common.reflect/transmit_differentials +
# whitted._sample_specular twins)
# ---------------------------------------------------------------------------


def _dndxy(hit: G.HitP):
    dndx = hit.s_dndu * hit.dudx + hit.s_dndv * hit.dvdx
    dndy = hit.s_dndu * hit.dudy + hit.s_dndv * hit.dvdy
    return dndx, dndy


def reflect_differentials(rd: G.RayP, hit: G.HitP, wi: V3):
    ns = hit.ns
    wo = hit.wo
    dndx, dndy = _dndxy(hit)
    rx_o = hit.p + hit.dpdx
    ry_o = hit.p + hit.dpdy
    dwodx = -rd.rx_direction - wo
    dwody = -rd.ry_direction - wo
    ddndx = dwodx.dot(ns) + wo.dot(dndx)
    ddndy = dwody.dot(ns) + wo.dot(dndy)
    won = wo.dot(ns)
    rx_d = wi - dwodx + (dndx * won + ns * ddndx) * 2.0
    ry_d = wi - dwody + (dndy * won + ns * ddndy) * 2.0
    return rx_o, ry_o, rx_d, ry_d


def transmit_differentials(rd: G.RayP, hit: G.HitP, lobes: S.LobesP,
                           wi: V3):
    wo = hit.wo
    ns = hit.ns
    dndx, dndy = _dndxy(hit)
    exiting = wo.dot(ns) < 0
    ns = V.where(exiting, -ns, ns)
    dndx = V.where(exiting, -dndx, dndx)
    dndy = V.where(exiting, -dndy, dndy)
    eta_int = jnp.maximum(lobes.eta, 1e-6)
    eta = jnp.where(exiting, eta_int, 1.0 / eta_int)

    rx_o = hit.p + hit.dpdx
    ry_o = hit.p + hit.dpdy
    dwodx = -rd.rx_direction - wo
    dwody = -rd.ry_direction - wo
    ddndx = dwodx.dot(ns) + wo.dot(dndx)
    ddndy = dwody.dot(ns) + wo.dot(dndy)
    won = wo.dot(ns)
    win = jnp.maximum(jnp.abs(wi.dot(ns)), 1e-9)
    mu = eta * won - win
    nu = eta - eta * eta * won / win
    dmudx = nu * ddndx
    dmudy = nu * ddndy
    rx_d = wi - dwodx * eta + (dndx * mu + ns * dmudx)
    ry_d = wi - dwody * eta + (dndy * mu + ns * dmudy)
    return rx_o, ry_o, rx_d, ry_d


def _sample_specular(scene, hit: G.HitP, lobes: S.LobesP, rd: G.RayP,
                     valid, keys, flags):
    u0, u1 = uniform2(keys)
    bs = S.sample_f(lobes, hit.wo, u0, u1, flags)
    cos_i = bs.wi.dot(hit.ns)
    ok = (valid & (bs.pdf > 0) & ~bs.f.is_black()
          & (jnp.abs(cos_i) > 1e-9))
    factor = bs.f * (jnp.abs(cos_i) / jnp.maximum(bs.pdf, 1e-20))

    if flags & lb.BSDF_REFLECTION:
        rx_o, ry_o, rx_d, ry_d = reflect_differentials(rd, hit, bs.wi)
    else:
        rx_o, ry_o, rx_d, ry_d = transmit_differentials(rd, hit, lobes,
                                                        bs.wi)
    child = G.RayP(
        o=hit.p + bs.wi * SPAWN_EPS,
        d=bs.wi,
        t_max=hit.time * 0.0 + jnp.inf,
        time=hit.time,
        has_differentials=rd.has_differentials & ok,
        rx_origin=rx_o, ry_origin=ry_o,
        rx_direction=rx_d, ry_direction=ry_d,
    )
    return child, factor, ok


# ---------------------------------------------------------------------------
# The level loop
# ---------------------------------------------------------------------------


def _compact(queue, capacity):
    """Keep the ``capacity`` most-alive entries, stable — one argsort +
    one row-matrix gather (whitted._compact twin, measured 2.7x faster
    than the packed tree gather)."""
    order = jnp.argsort(~queue["active"], stable=True)[:capacity]
    return V.tree_gather(queue, order)


def li(scene, rd, key, max_depth: int = 5,
       queue_capacity: int | None = None, return_aux: bool = False,
       level_caps: tuple | None = None):
    """Planar li over a megabatch (integrators/whitted.li twin; same
    queue/drop/useful-ray semantics and the same identity-keyed PRNG
    derivation, so images are bit-invariant to which path renders them
    only up to f32 association — pinned by the equiv tests).

    ``level_caps``: optional per-level queue capacities (len ==
    max_depth - 1, for levels 2..max_depth). When set, the depth loop
    unrolls (shapes differ per level); drops stay counted.
    """
    n = rd.o.shape[0]
    keys = U.ensure_lane_keys(key, n)
    cap = n if queue_capacity is None else max(int(queue_capacity), n)
    rp = G.RayP.of(rd)

    queue = dict(
        ox=rp.o.x, oy=rp.o.y, oz=rp.o.z,
        dx=rp.d.x, dy=rp.d.y, dz=rp.d.z,
        t_max=rp.t_max, time=rp.time, has_diff=rp.has_differentials,
        rxox=rp.rx_origin.x, rxoy=rp.rx_origin.y, rxoz=rp.rx_origin.z,
        ryox=rp.ry_origin.x, ryoy=rp.ry_origin.y, ryoz=rp.ry_origin.z,
        rxdx=rp.rx_direction.x, rxdy=rp.rx_direction.y,
        rxdz=rp.rx_direction.z,
        rydx=rp.ry_direction.x, rydy=rp.ry_direction.y,
        rydz=rp.ry_direction.z,
        br=jnp.ones((n,), F32), bg=jnp.ones((n,), F32),
        bb=jnp.ones((n,), F32),
        slot=jnp.arange(n, dtype=jnp.int32),
        path=jnp.zeros((n,), jnp.uint32),
        active=jnp.ones((n,), bool),
    )
    # Varying-axis tagging for shard_map (common.vary_like rationale):
    # constants in the initial carry must share the sharded operands'
    # varying type or lax-loop carries mismatch under shard_map.
    zf = rp.o.x * 0.0
    zb = zf != 0.0

    def _vary(x):
        if x.dtype == jnp.bool_:
            return x ^ zb
        return x + zf.astype(x.dtype)

    for k_ in ("br", "bg", "bb", "slot", "path", "active"):
        queue[k_] = _vary(queue[k_])
    if cap > n:
        pad_idx = jnp.concatenate(
            [jnp.arange(n, dtype=jnp.int32),
             jnp.zeros(cap - n, dtype=jnp.int32)])
        queue = V.tree_gather(queue, pad_idx)
        queue["active"] = queue["active"] & (jnp.arange(cap) < n)

    n_lights = WL.light_count(scene)

    def body(depth, carry):
        l_buf, queue, drops, useful = carry[:4]
        next_cap = carry[4]
        k_depth = U.fold_lanes(
            U.fold_lanes(keys[queue["slot"]], queue["path"]), depth)
        q_o = V3(queue["ox"], queue["oy"], queue["oz"])
        q_d = V3(queue["dx"], queue["dy"], queue["dz"])
        q_rd = G.RayP(
            o=q_o, d=q_d, t_max=queue["t_max"], time=queue["time"],
            has_differentials=queue["has_diff"],
            rx_origin=V3(queue["rxox"], queue["rxoy"], queue["rxoz"]),
            ry_origin=V3(queue["ryox"], queue["ryoy"], queue["ryoz"]),
            rx_direction=V3(queue["rxdx"], queue["rxdy"], queue["rxdz"]),
            ry_direction=V3(queue["rydx"], queue["rydy"], queue["rydz"]),
        )
        beta = V3(queue["br"], queue["bg"], queue["bb"])
        hit = closest_hit(scene, q_o, q_d, queue["t_max"], queue["time"])
        valid = queue["active"] & hit.valid
        useful = (useful + jnp.sum(queue["active"].astype(jnp.int32))
                  + n_lights * jnp.sum(valid.astype(jnp.int32)))
        hit = hit._replace(valid=valid)
        hit = G.compute_differentials(hit, q_rd)

        lobes = WM.compute_scattering(
            scene.materials, hit, allow_multiple_lobes=False,
            mode=lb.RADIANCE)

        contrib = WL.area_light_radiance(scene, hit, hit.wo)
        contrib = contrib + sum_over_lights(
            scene, hit, lobes, U.fold_lanes(k_depth, 0))
        contrib = sanitize(beta * contrib)
        c_pack = jnp.moveaxis(
            jnp.stack([jnp.where(valid, contrib.x, 0.0),
                       jnp.where(valid, contrib.y, 0.0),
                       jnp.where(valid, contrib.z, 0.0)], axis=0), 0, -1)
        l_buf = l_buf.at[queue["slot"]].add(c_pack)

        spawn = valid & (depth < max_depth)
        children = []
        for branch, flags in enumerate(
            (lb.BSDF_SPECULAR | lb.BSDF_REFLECTION,
             lb.BSDF_SPECULAR | lb.BSDF_TRANSMISSION)):
            child_rd, factor, ok = _sample_specular(
                scene, hit, lobes, q_rd, spawn,
                U.fold_lanes(k_depth, branch + 1), flags)
            cb = V.where(ok, beta * factor, 0.0)
            children.append(dict(
                ox=child_rd.o.x, oy=child_rd.o.y, oz=child_rd.o.z,
                dx=child_rd.d.x, dy=child_rd.d.y, dz=child_rd.d.z,
                t_max=child_rd.t_max, time=child_rd.time,
                has_diff=child_rd.has_differentials,
                rxox=child_rd.rx_origin.x, rxoy=child_rd.rx_origin.y,
                rxoz=child_rd.rx_origin.z,
                ryox=child_rd.ry_origin.x, ryoy=child_rd.ry_origin.y,
                ryoz=child_rd.ry_origin.z,
                rxdx=child_rd.rx_direction.x,
                rxdy=child_rd.rx_direction.y,
                rxdz=child_rd.rx_direction.z,
                rydx=child_rd.ry_direction.x,
                rydy=child_rd.ry_direction.y,
                rydz=child_rd.ry_direction.z,
                br=cb.x, bg=cb.y, bb=cb.z,
                slot=queue["slot"],
                path=queue["path"] * jnp.uint32(2) + jnp.uint32(branch + 1),
                active=ok,
            ))
        allc = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                            *children)
        live = jnp.sum(allc["active"].astype(jnp.int32))
        drops = drops + jnp.maximum(live - next_cap, 0)
        queue = _compact(allc, next_cap)
        return l_buf, queue, drops, useful

    l_buf0 = jnp.zeros((n, 3), F32) + zf[:, None]
    drops0 = jnp.sum(zf).astype(jnp.int32)
    if level_caps is None:
        def body_l(depth, carry):
            l_buf, queue, drops, useful = body(
                depth, (carry[0], carry[1], carry[2], carry[3], cap))
            return l_buf, queue, drops, useful

        l_buf, _, drops, useful = jax.lax.fori_loop(
            1, max_depth + 1, body_l, (l_buf0, queue, drops0, drops0))
    else:
        assert len(level_caps) >= max_depth - 1
        l_buf, q, drops, useful = l_buf0, queue, drops0, drops0
        for depth in range(1, max_depth + 1):
            next_cap = (int(level_caps[depth - 1])
                        if depth <= max_depth - 1 else 1)
            l_buf, q, drops, useful = body(
                jnp.int32(depth), (l_buf, q, drops, useful, next_cap))
    if return_aux:
        return l_buf, {"queue_drops": drops, "useful_rays": useful}
    return l_buf
