"""Planar-layout BSDF stack: Fresnel, GGX, lobes, aggregate.

Formula-for-formula twins of bxdf/fresnel.py, bxdf/ggx.py,
bxdf/lobes.py and bxdf/bsdf.py (reference: reflection/bxdf.jl,
microfacet.jl, lambertian.jl, specular.jl, materials/bsdf.jl) in the
planar component layout: local-frame directions are V3 of flat [N]
arrays, and the <=8-slot lobe table becomes a STATIC tuple of per-slot
parameter records — scenes carry only as many slots as their materials
actually populate (matte/mirror/metal 1, glass/plastic 2), so the
per-slot masked dispatch unrolls to exactly the work needed instead of
8 padded slots. Equality vs the packed path is pinned by
tests/test_wavefront_equiv.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..bxdf import lobes as lb
from ..bxdf.fresnel import (FRESNEL_CONDUCTOR, FRESNEL_DIELECTRIC,
                            FRESNEL_NOOP, fresnel_dielectric)
from ..core import vec as V
from ..core.vec import V3

F32 = jnp.float32


# ---------------------------------------------------------------------------
# Fresnel (bxdf/fresnel.py twins; dielectric is scalar already)
# ---------------------------------------------------------------------------


def fresnel_conductor(cos_theta_i, eta: V3, k: V3) -> V3:
    """bxdf.jl:102-125 with incident IOR 1 (as the packed evaluate)."""
    cos_i = jnp.clip(jnp.abs(cos_theta_i), -1.0, 1.0)
    cos2 = cos_i * cos_i
    sin2 = 1.0 - cos2

    def chan(e, kk):
        eta2 = e * e
        eta_k2 = kk * kk
        t0 = eta2 - eta_k2 - sin2
        a2b2 = jnp.sqrt(jnp.maximum(0.0, t0 * t0 + 4.0 * eta2 * eta_k2))
        t1 = a2b2 + cos2
        a = jnp.sqrt(jnp.maximum(0.0, 0.5 * (a2b2 + t0)))
        t2 = 2.0 * a * cos_i
        rs = (t1 - t2) / jnp.where(t1 + t2 == 0.0, 1.0, t1 + t2)
        t3 = cos2 * a2b2 + sin2 * sin2
        t4 = t2 * sin2
        rp = rs * (t3 - t4) / jnp.where(t3 + t4 == 0.0, 1.0, t3 + t4)
        return 0.5 * (rp + rs)

    return V3(chan(eta.x, k.x), chan(eta.y, k.y), chan(eta.z, k.z))


def fresnel_eval(fr_kind, cos_theta_i, eta_a, eta_b, fr_eta: V3,
                 fr_k: V3) -> V3:
    """Masked Fresnel dispatch -> RGB V3 (fresnel.evaluate twin)."""
    diel = fresnel_dielectric(cos_theta_i, eta_a, eta_b)
    out = V.where(fr_kind == FRESNEL_DIELECTRIC,
                  V3(diel, diel, diel), 1.0)
    cond = fresnel_conductor(cos_theta_i, fr_eta, fr_k)
    return V.where(fr_kind == FRESNEL_CONDUCTOR, cond, out)


# ---------------------------------------------------------------------------
# GGX (bxdf/ggx.py twins; w is a local-frame V3)
# ---------------------------------------------------------------------------


def _tan2_theta(w: V3):
    return V.sin2_theta(w) / V.cos2_theta(w)


def ggx_distribution(wh: V3, alpha_x, alpha_y):
    tan2 = _tan2_theta(wh)
    cos4 = V.cos2_theta(wh) ** 2
    e = (
        V.cos_phi(wh) ** 2 / jnp.maximum(alpha_x**2, 1e-12)
        + V.sin_phi(wh) ** 2 / jnp.maximum(alpha_y**2, 1e-12)
    ) * tan2
    d = 1.0 / (V.PI * alpha_x * alpha_y * cos4 * (1.0 + e) ** 2)
    return jnp.where(jnp.isfinite(tan2) & (cos4 > 1e-16), d, 0.0)


def _ggx_lambda(w: V3, alpha_x, alpha_y):
    abs_tan = jnp.abs(V.sin_theta(w) / V.cos_theta(w))
    alpha = jnp.sqrt(
        V.cos_phi(w) ** 2 * alpha_x**2 + V.sin_phi(w) ** 2 * alpha_y**2
    )
    a2t2 = (alpha * abs_tan) ** 2
    lam = (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0
    return jnp.where(jnp.isfinite(abs_tan), lam, 0.0)


def ggx_g1(w: V3, alpha_x, alpha_y):
    return 1.0 / (1.0 + _ggx_lambda(w, alpha_x, alpha_y))


def ggx_g(wo: V3, wi: V3, alpha_x, alpha_y):
    return 1.0 / (
        1.0 + _ggx_lambda(wo, alpha_x, alpha_y)
        + _ggx_lambda(wi, alpha_x, alpha_y)
    )


def _sample11(cos_theta, u1, u2):
    """ggx._sample11 twin (microfacet.jl:112-171)."""
    r_ni = jnp.sqrt(u1 / jnp.maximum(1.0 - u1, 1e-12))
    phi_ni = 2.0 * V.PI * u2
    sx_ni = r_ni * jnp.cos(phi_ni)
    sy_ni = r_ni * jnp.sin(phi_ni)

    cos_t = jnp.minimum(cos_theta, 0.9998)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    tan_t = sin_t / cos_t
    a = 1.0 / tan_t
    g1_ = 2.0 / (1.0 + jnp.sqrt(1.0 + 1.0 / (a * a)))

    A = 2.0 * u1 / g1_ - 1.0
    tmp = jnp.minimum(
        1.0 / jnp.where(A * A - 1.0 == 0.0, 1e-10, A * A - 1.0), 1e10)
    B = tan_t
    D = jnp.sqrt(jnp.maximum(B * B * tmp * tmp - (A * A - B * B) * tmp, 0.0))
    sx1 = B * tmp - D
    sx2 = B * tmp + D
    slope_x = jnp.where((A < 0.0) | (sx2 > 1.0 / tan_t), sx1, sx2)

    s = jnp.where(u2 > 0.5, 1.0, -1.0)
    u2r = jnp.where(u2 > 0.5, 2.0 * (u2 - 0.5), 2.0 * (0.5 - u2))
    z = (u2r * (u2r * (u2r * 0.27385 - 0.73369) + 0.46341)) / (
        u2r * (u2r * (u2r * 0.093073 + 0.309420) - 1.0) + 0.597999
    )
    slope_y = s * z * jnp.sqrt(1.0 + slope_x * slope_x)

    ni = cos_theta > 0.9999
    return (jnp.where(ni, sx_ni, slope_x), jnp.where(ni, sy_ni, slope_y))


def ggx_sample_wh(wo: V3, u0, u1, alpha_x, alpha_y) -> V3:
    """ggx.sample_wh twin (microfacet.jl:173-201)."""
    flip = V.cos_theta(wo) < 0.0
    w = V.where(flip, -wo, wo)
    wi_s = V3(alpha_x * w.x, alpha_y * w.y, w.z).normalize()
    sx, sy = _sample11(V.cos_theta(wi_s), u0, u1)
    cp, sp = V.cos_phi(wi_s), V.sin_phi(wi_s)
    tmp = cp * sx - sp * sy
    sy = sp * sx + cp * sy
    sx = tmp
    sx = alpha_x * sx
    sy = alpha_y * sy
    wh = V3(-sx, -sy, jnp.ones_like(sx)).normalize()
    return V.where(flip, -wh, wh)


def ggx_pdf_wh(wo: V3, wh: V3, alpha_x, alpha_y):
    return (
        ggx_distribution(wh, alpha_x, alpha_y)
        * ggx_g1(wo, alpha_x, alpha_y)
        * jnp.abs(wo.dot(wh))
        / jnp.maximum(jnp.abs(V.cos_theta(wo)), 1e-12)
    )


# ---------------------------------------------------------------------------
# Per-slot lobes (bxdf/lobes.py twins)
# ---------------------------------------------------------------------------


class LobeSlotP(NamedTuple):
    kind: jnp.ndarray    # [N] i32
    c0: V3
    c1: V3
    eta_a: jnp.ndarray
    eta_b: jnp.ndarray
    a: jnp.ndarray
    b: jnp.ndarray
    fr_kind: jnp.ndarray
    fr_eta: V3
    fr_k: V3


def empty_slot(n) -> LobeSlotP:
    z = jnp.zeros((n,), F32)
    zi = jnp.zeros((n,), jnp.int32)
    z3 = V3.zeros((n,))
    return LobeSlotP(zi, z3, z3, z + 1.0, z + 1.0, z, z, zi, z3, z3)


class LobesP(NamedTuple):
    """Static-width planar lobe table + shading frame (bsdf.py Lobes
    twin; slot count = what the scene's materials need, not 8)."""
    slots: tuple
    ng: V3
    ns: V3
    ss: V3
    ts: V3
    eta: jnp.ndarray


def _safe_div(a, b, eps=1e-12):
    return a / jnp.where(jnp.abs(b) < eps, 1.0, b)


_Z_UP = None  # placeholder; V3 of broadcast handled inline


def _f_oren_nayar(p: LobeSlotP, wo: V3, wi: V3) -> V3:
    sin_i = V.sin_theta(wi)
    sin_o = V.sin_theta(wo)
    d_cos = V.cos_phi(wi) * V.cos_phi(wo) + V.sin_phi(wi) * V.sin_phi(wo)
    max_cos = jnp.where(
        (sin_i > 1e-4) & (sin_o > 1e-4), jnp.maximum(0.0, d_cos), 0.0)
    abs_ci = jnp.abs(V.cos_theta(wi))
    abs_co = jnp.abs(V.cos_theta(wo))
    i_bigger = abs_ci > abs_co
    sin_alpha = jnp.where(i_bigger, sin_o, sin_i)
    tan_beta = jnp.where(
        i_bigger, _safe_div(sin_i, abs_ci), _safe_div(sin_o, abs_co))
    scale = V.INV_PI * (p.a + p.b * max_cos * sin_alpha * tan_beta)
    return p.c0 * scale


def _f_microfacet_reflection(p: LobeSlotP, wo: V3, wi: V3) -> V3:
    cos_o = jnp.abs(V.cos_theta(wo))
    cos_i = jnp.abs(V.cos_theta(wi))
    wh = wi + wo
    degen = (cos_i < 1e-12) | (cos_o < 1e-12) | (wh.length_squared() < 1e-16)
    z_up = V3.full(wh.x.shape, 0.0, 0.0, 1.0)
    wh = V.where(degen, z_up, wh).normalize()
    wh_ff = V.face_forward(wh, z_up)
    f_val = fresnel_eval(p.fr_kind, wi.dot(wh_ff), p.eta_a, p.eta_b,
                         p.fr_eta, p.fr_k)
    d = ggx_distribution(wh, p.a, p.b)
    g = ggx_g(wo, wi, p.a, p.b)
    spec = p.c0 * f_val * _safe_div(d * g, 4.0 * cos_i * cos_o)
    return V.where(degen, 0.0, spec)


def _f_microfacet_transmission(p: LobeSlotP, wo: V3, wi: V3, mode) -> V3:
    same = V.same_hemisphere(wo, wi)
    cos_o = V.cos_theta(wo)
    cos_i = V.cos_theta(wi)
    eta = jnp.where(cos_o > 0.0, p.eta_b / p.eta_a, p.eta_a / p.eta_b)
    wh = wo + wi * eta
    degen = (jnp.abs(cos_i) < 1e-12) | (jnp.abs(cos_o) < 1e-12) | (
        wh.length_squared() < 1e-16)
    z_up = V3.full(wh.x.shape, 0.0, 0.0, 1.0)
    wh = V.where(degen, z_up, wh).normalize()
    wh = V.where(V.cos_theta(wh) < 0.0, -wh, wh)
    same_side = wo.dot(wh) * wi.dot(wh) > 0.0
    f_diel = fresnel_dielectric(wo.dot(wh), p.eta_a, p.eta_b)
    sqrt_denom = wo.dot(wh) + eta * wi.dot(wh)
    factor = (1.0 / eta) if mode == lb.RADIANCE else jnp.ones_like(eta)
    d = ggx_distribution(wh, p.a, p.b)
    g = ggx_g(wo, wi, p.a, p.b)
    val = (1.0 - f_diel) * jnp.abs(
        _safe_div(
            d * g * eta * eta * jnp.abs(wi.dot(wh)) * jnp.abs(wo.dot(wh))
            * factor * factor,
            cos_i * cos_o * sqrt_denom * sqrt_denom,
        )
    )
    out = p.c0 * val
    return V.where(same | degen | same_side, 0.0, out)


def lobe_f(p: LobeSlotP, wo: V3, wi: V3, mode=lb.RADIANCE) -> V3:
    """lobes.f twin: one slot's f(wo, wi); delta lobes 0."""
    k = p.kind
    out = V3.zeros(k.shape)
    lam_r = p.c0 * V.INV_PI
    out = V.where((k == lb.LAMBERTIAN_REFLECTION)
                  | (k == lb.LAMBERTIAN_TRANSMISSION), lam_r, out)
    out = V.where(k == lb.OREN_NAYAR, _f_oren_nayar(p, wo, wi), out)
    out = V.where(k == lb.MICROFACET_REFLECTION,
                  _f_microfacet_reflection(p, wo, wi), out)
    out = V.where(k == lb.MICROFACET_TRANSMISSION,
                  _f_microfacet_transmission(p, wo, wi, mode), out)
    return out


def lobe_pdf(p: LobeSlotP, wo: V3, wi: V3):
    """lobes.pdf twin."""
    k = p.kind
    same = V.same_hemisphere(wo, wi)
    cos_pdf = jnp.abs(V.cos_theta(wi)) * V.INV_PI

    out = jnp.zeros(k.shape, F32)
    diffuse_r = (k == lb.LAMBERTIAN_REFLECTION) | (k == lb.OREN_NAYAR)
    out = jnp.where(diffuse_r & same, cos_pdf, out)
    out = jnp.where((k == lb.LAMBERTIAN_TRANSMISSION) & ~same, cos_pdf, out)

    z_up = V3.full(k.shape, 0.0, 0.0, 1.0)
    wh_r = wo + wi
    wh_r_ok = wh_r.length_squared() > 1e-16
    wh_rn = V.where(wh_r_ok, wh_r, z_up).normalize()
    pdf_mr = _safe_div(ggx_pdf_wh(wo, wh_rn, p.a, p.b), 4.0 * wo.dot(wh_rn))
    out = jnp.where((k == lb.MICROFACET_REFLECTION) & same & wh_r_ok,
                    pdf_mr, out)

    eta = jnp.where(V.cos_theta(wo) > 0.0, p.eta_b / p.eta_a,
                    p.eta_a / p.eta_b)
    wh_t = wo + wi * eta
    wh_t_ok = wh_t.length_squared() > 1e-16
    wh_tn = V.where(wh_t_ok, wh_t, z_up).normalize()
    same_side = wo.dot(wh_tn) * wi.dot(wh_tn) > 0.0
    sqrt_denom = wo.dot(wh_tn) + eta * wi.dot(wh_tn)
    dwh_dwi = jnp.abs(
        _safe_div(eta * eta * wi.dot(wh_tn), sqrt_denom * sqrt_denom))
    pdf_mt = ggx_pdf_wh(wo, wh_tn, p.a, p.b) * dwh_dwi
    out = jnp.where(
        (k == lb.MICROFACET_TRANSMISSION) & ~same & wh_t_ok & ~same_side,
        pdf_mt, out)
    return out


class LobeSampleP(NamedTuple):
    wi: V3
    f: V3
    pdf: jnp.ndarray
    sampled_flags: jnp.ndarray


def lobe_sample(p: LobeSlotP, wo: V3, u0, u1, mode=lb.RADIANCE
                ) -> LobeSampleP:
    """lobes.sample twin: sample one slot per lane."""
    k = p.kind
    zf = jnp.zeros(k.shape, F32)
    flags = lb.lobe_flags(k)

    wi_cos = V.cosine_sample_hemisphere(u0, u1)
    neg = V.cos_theta(wo) < 0.0
    wi_refl = V3(wi_cos.x, wi_cos.y, jnp.where(neg, -wi_cos.z, wi_cos.z))
    wi_trans = -wi_refl

    wi_sr = V3(-wo.x, -wo.y, wo.z)
    cos_sr = V.cos_theta(wi_sr)
    f_sr = (fresnel_eval(p.fr_kind, cos_sr, p.eta_a, p.eta_b, p.fr_eta,
                         p.fr_k)
            * p.c0 * (1.0 / jnp.maximum(jnp.abs(cos_sr), 1e-12)))

    entering = V.cos_theta(wo) > 0.0
    eta_i = jnp.where(entering, p.eta_a, p.eta_b)
    eta_t = jnp.where(entering, p.eta_b, p.eta_a)
    sgn = jnp.where(entering, 1.0, -1.0)
    n_ff = V3(zf, zf, sgn)
    refr_ok, wi_st = V.refract(wo, n_ff, eta_i / eta_t)
    cos_st = V.cos_theta(wi_st)
    fr_st = fresnel_dielectric(cos_st, p.eta_a, p.eta_b)
    if mode == lb.RADIANCE:
        eta_scale = (eta_i / eta_t) ** 2
    else:
        eta_scale = jnp.ones_like(eta_i)
    f_st = p.c0 * ((1.0 - fr_st) * eta_scale
                   / jnp.maximum(jnp.abs(cos_st), 1e-12))
    f_st = V.where(refr_ok, f_st, 0.0)

    fr_coin = fresnel_dielectric(V.cos_theta(wo), p.eta_a, p.eta_b)
    take_refl = u0 < fr_coin
    f_fs_r = p.c0 * (fr_coin / jnp.maximum(jnp.abs(cos_sr), 1e-12))
    f_fs_t = p.c1 * ((1.0 - fr_coin) * eta_scale
                     / jnp.maximum(jnp.abs(cos_st), 1e-12))
    f_fs_t = V.where(refr_ok, f_fs_t, 0.0)
    wi_fs = V.where(take_refl, wi_sr, wi_st)
    f_fs = V.where(take_refl, f_fs_r, f_fs_t)
    pdf_fs = jnp.where(take_refl, fr_coin, 1.0 - fr_coin)
    flags_fs = jnp.where(
        take_refl,
        jnp.int32(lb.BSDF_SPECULAR | lb.BSDF_REFLECTION),
        jnp.int32(lb.BSDF_SPECULAR | lb.BSDF_TRANSMISSION),
    )

    wh = ggx_sample_wh(wo, u0, u1, p.a, p.b)
    wo_dot_wh = wo.dot(wh)
    wi_mr = -wo + wh * (2.0 * wo_dot_wh)
    mr_ok = (wo_dot_wh > 0.0) & V.same_hemisphere(wo, wi_mr) & (
        jnp.abs(V.cos_theta(wo)) > 1e-12)
    pdf_mr = _safe_div(ggx_pdf_wh(wo, wh, p.a, p.b), 4.0 * wo_dot_wh)

    eta_refr = jnp.where(entering, p.eta_a / p.eta_b, p.eta_b / p.eta_a)
    wh_ff = V.face_forward(wh, wo)
    mt_ok0, wi_mt = V.refract(wo, wh_ff, eta_refr)
    mt_ok = (
        mt_ok0 & (wo_dot_wh > 0.0) & ~V.same_hemisphere(wo, wi_mt)
        & (jnp.abs(V.cos_theta(wo)) > 1e-12)
    )

    z_up = V3(zf, zf, zf + 1.0)
    wi = z_up
    for kk, vv in (
        (lb.LAMBERTIAN_REFLECTION, wi_refl),
        (lb.OREN_NAYAR, wi_refl),
        (lb.LAMBERTIAN_TRANSMISSION, wi_trans),
        (lb.SPECULAR_REFLECTION, wi_sr),
        (lb.SPECULAR_TRANSMISSION, wi_st),
        (lb.FRESNEL_SPECULAR, wi_fs),
        (lb.MICROFACET_REFLECTION, wi_mr),
        (lb.MICROFACET_TRANSMISSION, wi_mt),
    ):
        wi = V.where(k == kk, vv, wi)

    f_eval = lobe_f(p, wo, wi, mode)
    pdf_eval = lobe_pdf(p, wo, wi)

    f_out = f_eval
    for kk, vv in ((lb.SPECULAR_REFLECTION, f_sr),
                   (lb.SPECULAR_TRANSMISSION, f_st),
                   (lb.FRESNEL_SPECULAR, f_fs)):
        f_out = V.where(k == kk, vv, f_out)
    pdf_out = pdf_eval
    for kk, vv in (
        (lb.SPECULAR_REFLECTION, jnp.ones_like(zf)),
        (lb.SPECULAR_TRANSMISSION, jnp.where(refr_ok, 1.0, 0.0)),
        (lb.FRESNEL_SPECULAR, pdf_fs),
        (lb.MICROFACET_REFLECTION, jnp.where(mr_ok, pdf_mr, 0.0)),
    ):
        pdf_out = jnp.where(k == kk, vv, pdf_out)

    fail = (
        ((k == lb.SPECULAR_TRANSMISSION) & ~refr_ok)
        | ((k == lb.MICROFACET_REFLECTION) & ~mr_ok)
        | ((k == lb.MICROFACET_TRANSMISSION) & ~mt_ok)
        | (k == lb.NONE)
    )
    f_out = V.where(fail, 0.0, f_out)
    pdf_out = jnp.where(fail, 0.0, pdf_out)
    sampled_flags = jnp.where(k == lb.FRESNEL_SPECULAR, flags_fs, flags)
    return LobeSampleP(wi, f_out, pdf_out, sampled_flags)


# ---------------------------------------------------------------------------
# BSDF aggregate (bxdf/bsdf.py twins; static slot loop)
# ---------------------------------------------------------------------------


def from_hit(hit, n_slots: int) -> LobesP:
    """bsdf.from_hit twin: empty static-width table with the hit frame."""
    n = hit.t.shape[0]
    ss = hit.s_dpdu.normalize()
    return LobesP(
        slots=tuple(empty_slot(n) for _ in range(n_slots)),
        ng=hit.n, ns=hit.ns, ss=ss, ts=hit.ns.cross(ss),
        eta=jnp.ones((n,), F32),
    )


def world_to_local(lo: LobesP, v: V3) -> V3:
    return V3(v.dot(lo.ss), v.dot(lo.ts), v.dot(lo.ns))


def local_to_world(lo: LobesP, v: V3) -> V3:
    return lo.ss * v.x + lo.ts * v.y + lo.ns * v.z


def _matching(lo: LobesP, flags):
    return [lb.matches_flags(s.kind, flags) & (s.kind != lb.NONE)
            for s in lo.slots]


def _refl_trans_mask(lo: LobesP, slot: LobeSlotP, wo_w: V3, wi_w: V3):
    reflect = (wi_w.dot(lo.ng) * wo_w.dot(lo.ng)) > 0.0
    fl = lb.lobe_flags(slot.kind)
    has_r = (fl & lb.BSDF_REFLECTION) != 0
    has_t = (fl & lb.BSDF_TRANSMISSION) != 0
    return jnp.where(reflect, has_r, has_t)


def f(lo: LobesP, wo_w: V3, wi_w: V3, flags=lb.BSDF_ALL,
      mode=lb.RADIANCE) -> V3:
    """bsdf.f twin: sum f over matching lobes (bsdf.jl:79-100)."""
    wo = world_to_local(lo, wo_w)
    wi = world_to_local(lo, wi_w)
    degenerate = jnp.abs(wo.z) < 1e-12
    match = _matching(lo, flags)
    total = V3.zeros(wo.z.shape)
    for s, ms in zip(lo.slots, match):
        msk = ms & _refl_trans_mask(lo, s, wo_w, wi_w)
        total = total + V.where(msk, lobe_f(s, wo, wi, mode), 0.0)
    return V.where(degenerate, 0.0, total)


def compute_pdf(lo: LobesP, wo_w: V3, wi_w: V3, flags=lb.BSDF_ALL):
    """bsdf.compute_pdf twin (bsdf.jl:177-193)."""
    wo = world_to_local(lo, wo_w)
    wi = world_to_local(lo, wi_w)
    match = _matching(lo, flags)
    total = jnp.zeros(wo.z.shape, F32)
    count = jnp.zeros(wo.z.shape, jnp.int32)
    for s, ms in zip(lo.slots, match):
        total = total + jnp.where(ms, lobe_pdf(s, wo, wi), 0.0)
        count = count + ms.astype(jnp.int32)
    pdf = jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)
    return jnp.where(jnp.abs(wo.z) < 1e-12, 0.0, pdf)


class BSDFSampleP(NamedTuple):
    wi: V3
    f: V3
    pdf: jnp.ndarray
    sampled_flags: jnp.ndarray


def _select_slot(slots, is_chosen_list) -> LobeSlotP:
    """Masked one-hot merge of the chosen slot's params (static loop —
    the planar twin of bsdf._gather_params)."""
    out = slots[0]
    for s, ch in zip(slots[1:], is_chosen_list[1:]):
        out = LobeSlotP(
            kind=jnp.where(ch, s.kind, out.kind),
            c0=V.where(ch, s.c0, out.c0),
            c1=V.where(ch, s.c1, out.c1),
            eta_a=jnp.where(ch, s.eta_a, out.eta_a),
            eta_b=jnp.where(ch, s.eta_b, out.eta_b),
            a=jnp.where(ch, s.a, out.a),
            b=jnp.where(ch, s.b, out.b),
            fr_kind=jnp.where(ch, s.fr_kind, out.fr_kind),
            fr_eta=V.where(ch, s.fr_eta, out.fr_eta),
            fr_k=V.where(ch, s.fr_k, out.fr_k),
        )
    return out


def sample_f(lo: LobesP, wo_w: V3, u0, u1, flags=lb.BSDF_ALL,
             mode=lb.RADIANCE) -> BSDFSampleP:
    """bsdf.sample_f twin (bsdf.jl:107-175): uniform matching-lobe pick,
    pdf averaging and f summing across matching non-specular lobes."""
    match = _matching(lo, flags)
    count = jnp.zeros(u0.shape, jnp.int32)
    for ms in match:
        count = count + ms.astype(jnp.int32)
    any_match = count > 0

    comp = jnp.minimum(
        jnp.floor(u0 * count.astype(F32)).astype(jnp.int32),
        jnp.maximum(count - 1, 0),
    )
    # rank among matches, static scan
    is_chosen = []
    rank = jnp.zeros(u0.shape, jnp.int32) - 1
    for ms in match:
        rank = rank + ms.astype(jnp.int32)
        is_chosen.append(ms & (rank == comp))
    # first-true wins (ranks are strictly increasing over matches)
    seen = jnp.zeros(u0.shape, bool)
    for i in range(len(is_chosen)):
        is_chosen[i] = is_chosen[i] & ~seen
        seen = seen | is_chosen[i]

    u0r = jnp.minimum(u0 * count.astype(F32) - comp.astype(F32), 1.0 - 1e-6)

    wo = world_to_local(lo, wo_w)
    degenerate = jnp.abs(wo.z) < 1e-12

    chosen = _select_slot(list(lo.slots), is_chosen)
    ls = lobe_sample(chosen, wo, u0r, u1, mode)
    wi = ls.wi
    wi_w = local_to_world(lo, wi)

    specular = (ls.sampled_flags & lb.BSDF_SPECULAR) != 0
    multi = count > 1

    pdf_others = jnp.zeros(u0.shape, F32)
    for s, ms, ch in zip(lo.slots, match, is_chosen):
        pdf_others = pdf_others + jnp.where(
            ms & ~ch, lobe_pdf(s, wo, wi), 0.0)
    pdf = ls.pdf + jnp.where(~specular & multi, pdf_others, 0.0)
    pdf = jnp.where(multi, pdf / jnp.maximum(count, 1), pdf)

    f_sum = V3.zeros(u0.shape)
    for s, ms in zip(lo.slots, match):
        msk = ms & _refl_trans_mask(lo, s, wo_w, wi_w)
        f_sum = f_sum + V.where(msk, lobe_f(s, wo, wi, mode), 0.0)
    f_out = V.where(specular, ls.f, f_sum)

    ok = any_match & ~degenerate & (pdf > 0.0)
    return BSDFSampleP(
        wi=wi_w,
        f=V.where(ok, f_out, 0.0),
        pdf=jnp.where(ok, pdf, 0.0),
        sampled_flags=jnp.where(ok, ls.sampled_flags, 0),
    )
