"""Planar SPPM camera pass (visible-point generation).

Twin of SPPMIntegrator._camera_pass_body (reference sppm.jl:175-270) in
the planar component layout: the depth walk runs on flat [N] component
arrays (core/vec.py), and only the OUTPUT — (ld, VisiblePoints) — is
converted to the packed form the grid/pair phases consume (one
transpose set per chunk). PRNG derivation matches the packed body
column for column; scenes the planar modules gate out (env lights,
instanced geometry, animated views) keep the packed body.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..bxdf import bsdf as B
from ..bxdf import lobes as lb
from ..core import vec as V
from ..core.ray import SPAWN_EPS, scale_differentials
from ..core.vec import V3
from ..sampler import uniform as U
from . import geom as G
from . import lights as WL
from . import materials as WM
from . import path as WP
from . import shade as S
from . import whitted as WW

F32 = jnp.float32


def supports(scene) -> bool:
    return WP.supports(scene)


def num_components_planar(lo: S.LobesP, flags) -> jnp.ndarray:
    """bsdf.num_components twin on the static slot tuple."""
    out = None
    for s in lo.slots:
        ms = (lb.matches_flags(s.kind, flags)
              & (s.kind != lb.NONE)).astype(jnp.int32)
        out = ms if out is None else out + ms
    return out


def _slotp_field(slots, name, n):
    """Stack one per-slot field into the packed [N, L(, 3)] layout,
    padding with empty-slot values up to ``n`` slots."""
    vals = [getattr(s, name) for s in slots]
    tmpl = vals[0]
    while len(vals) < n:
        if isinstance(tmpl, V3):
            vals.append(V3.zeros(tmpl.x.shape))
        elif name in ("eta_a", "eta_b"):
            vals.append(jnp.ones_like(tmpl))
        else:
            vals.append(jnp.zeros_like(tmpl))
    if isinstance(tmpl, V3):
        rows = [jnp.stack([v.x, v.y, v.z], axis=0) for v in vals]  # [3, N]
        return jnp.transpose(jnp.stack(rows, axis=0), (2, 0, 1))   # [N, L, 3]
    return jnp.moveaxis(jnp.stack(vals, axis=0), 0, -1)            # [N, L]


def lobesp_to_packed(lo: S.LobesP, n_slots: int) -> B.Lobes:
    """Planar static-slot table -> packed B.Lobes with ``n_slots``."""
    f = lambda name: _slotp_field(list(lo.slots), name, n_slots)
    return B.Lobes(
        kind=f("kind"), c0=f("c0"), c1=f("c1"),
        eta_a=f("eta_a"), eta_b=f("eta_b"), a=f("a"), b=f("b"),
        fr_kind=f("fr_kind"), fr_eta=f("fr_eta"), fr_k=f("fr_k"),
        ng=lo.ng.arr(), ns=lo.ns.arr(), ss=lo.ss.arr(), ts=lo.ts.arr(),
        eta=lo.eta,
    )


def camera_pass_body(integ, scene, pixels, lane_valid, key):
    """Planar _camera_pass_body: returns (ld_add [C, 3], VisiblePoints
    packed chunk) — byte-compatible with the packed body's outputs."""
    from ..integrators.sppm import VP_LOBES, VisiblePoints, _compact_lobes

    c = pixels.shape[0]
    inv_sqrt_spp = np.float32(1.0 / np.sqrt(integ.n_iterations))
    ks = U.lane_keys(key, U.pixel_ids(pixels))
    p_film, u_lens, u_time = U.get_camera_samples_lanes(
        U.fold_lanes(ks, 0), pixels)
    rd, beta_w = integ.camera.generate_ray_differentials(
        p_film, u_lens, u_time)
    rd = scale_differentials(rd, inv_sqrt_spp)
    rp = G.RayP.of(rd)

    zf = rp.o.x * 0.0
    zb = zf != 0.0
    n_slots = max(WM.scene_slot_count(scene.materials), VP_LOBES)

    def empty_vp_slots():
        return tuple(S.empty_slot(c) for _ in range(n_slots))

    def body(depth, carry):
        (o, d, time, beta, active, specular_bounce, ld,
         vp_p, vp_wo, vp_beta, vp_valid, vp_slots, vp_frame) = carry
        k_depth = U.fold_lanes(ks, depth)
        hit = WW.closest_hit(scene, o, d, jnp.full((c,), jnp.inf, F32),
                             time)
        live = active & hit.valid
        hit = hit._replace(valid=live)
        lobes = WM.compute_scattering(
            scene.materials, hit, allow_multiple_lobes=True,
            mode=lb.RADIANCE)
        le = WL.area_light_radiance(scene, hit, hit.wo)
        emit_mask = live & (specular_bounce | (depth == 1))
        ld = ld + V.where(emit_mask, beta * le, 0.0)
        # Direct lighting, NOT scaled by beta (sppm.jl:229-231 quirk).
        direct = WP.uniform_sample_one_light(
            scene, hit, lobes, U.fold_lanes(k_depth, 0))
        ld = ld + V.where(live, direct, 0.0)

        is_diffuse = num_components_planar(
            lobes,
            lb.BSDF_DIFFUSE | lb.BSDF_REFLECTION | lb.BSDF_TRANSMISSION,
        ) > 0
        is_glossy = num_components_planar(
            lobes,
            lb.BSDF_GLOSSY | lb.BSDF_REFLECTION | lb.BSDF_TRANSMISSION,
        ) > 0
        make_vp = live & (
            is_diffuse | (is_glossy & (depth == integ.max_depth)))
        vp_p = V.where(make_vp, hit.p, vp_p)
        vp_wo = V.where(make_vp, hit.wo, vp_wo)
        vp_beta = V.where(make_vp, beta, vp_beta)
        vp_valid = vp_valid | make_vp
        new_slots = []
        for s_new, s_old in zip(lobes.slots, vp_slots):
            new_slots.append(S.LobeSlotP(
                kind=jnp.where(make_vp, s_new.kind, s_old.kind),
                c0=V.where(make_vp, s_new.c0, s_old.c0),
                c1=V.where(make_vp, s_new.c1, s_old.c1),
                eta_a=jnp.where(make_vp, s_new.eta_a, s_old.eta_a),
                eta_b=jnp.where(make_vp, s_new.eta_b, s_old.eta_b),
                a=jnp.where(make_vp, s_new.a, s_old.a),
                b=jnp.where(make_vp, s_new.b, s_old.b),
                fr_kind=jnp.where(make_vp, s_new.fr_kind, s_old.fr_kind),
                fr_eta=V.where(make_vp, s_new.fr_eta, s_old.fr_eta),
                fr_k=V.where(make_vp, s_new.fr_k, s_old.fr_k),
            ))
        vp_slots = tuple(new_slots) + vp_slots[len(new_slots):]
        vp_frame = tuple(
            V.where(make_vp, a, b_)
            for a, b_ in zip((lobes.ng, lobes.ns, lobes.ss, lobes.ts),
                             vp_frame[:4])
        ) + (jnp.where(make_vp, lobes.eta, vp_frame[4]),)
        active = live & ~make_vp

        u0, u1 = WW.uniform2(U.fold_lanes(k_depth, 1))
        bs = S.sample_f(lobes, hit.wo, u0, u1, lb.BSDF_ALL)
        ok = active & (bs.pdf > 0) & ~bs.f.is_black()
        specular_bounce = jnp.where(
            ok, (bs.sampled_flags & lb.BSDF_SPECULAR) != 0,
            specular_bounce)
        beta_new = beta * bs.f * (
            jnp.abs(bs.wi.dot(hit.ns)) / jnp.maximum(bs.pdf, 1e-20))
        by = WP.to_y(beta_new)
        rr = by < 0.25
        cp = jnp.minimum(1.0, by)
        u_rr = U.uniform_lanes(U.fold_lanes(k_depth, 2), 1)[:, 0]
        killed = rr & (u_rr > cp)
        beta_next = V.where(rr & ~killed,
                            beta_new / jnp.maximum(cp, 1e-20), beta_new)
        beta = V.where(ok, beta_next, beta)
        active = ok & ~killed
        o = V.where(active, hit.p + bs.wi * SPAWN_EPS, o)
        d = V.where(active, bs.wi, d)
        time = jnp.where(active, hit.time, time)
        return (o, d, time, beta, active, specular_bounce, ld,
                vp_p, vp_wo, vp_beta, vp_valid, vp_slots, vp_frame)

    ones = 1.0 + zf
    beta0 = V3(ones, ones, ones) * beta_w
    z3 = V3(zf, zf, zf)
    carry = (
        rp.o, rp.d, rp.time, beta0,
        (lane_valid & (beta_w > 0)), jnp.zeros((c,), bool),
        z3,                                      # ld
        z3, z3, z3, jnp.zeros((c,), bool),       # vp p/wo/beta/valid
        empty_vp_slots(),
        (z3, z3, z3, z3, zf),                    # vp frame ng/ns/ss/ts/eta
    )

    # Varying-axis tagging for shard_map (common.vary_like rationale):
    # every [c]-shaped carry leaf — incl. the vp slot/frame zeros —
    # must carry the sharded operands' varying type or the lax-loop
    # carry types mismatch under shard_map.
    def _vary(x):
        if x.dtype == jnp.bool_:
            return x ^ zb
        return x + zf.astype(x.dtype)

    carry = jax.tree.map(_vary, carry)
    carry = jax.lax.fori_loop(1, integ.max_depth + 1, body, carry)
    (_, _, _, _, _, _, ld,
     vp_p, vp_wo, vp_beta, vp_valid, vp_slots, vp_frame) = carry

    vp_lo = S.LobesP(slots=vp_slots, ng=vp_frame[0], ns=vp_frame[1],
                     ss=vp_frame[2], ts=vp_frame[3], eta=vp_frame[4])
    # n_slots >= VP_LOBES by construction; _compact_lobes slices the
    # packed slot axis down to exactly VP_LOBES.
    vp = VisiblePoints(
        p=vp_p.arr(), wo=vp_wo.arr(), beta=vp_beta.arr(), valid=vp_valid,
        lobes=_compact_lobes(lobesp_to_packed(vp_lo, n_slots)),
    )
    return ld.arr(), vp
