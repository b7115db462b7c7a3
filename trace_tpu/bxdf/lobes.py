"""Fixed-width BSDF lobe tables with masked kind-dispatch.

TPU-native counterpart of /root/reference/src/reflection/ (lambertian.jl,
specular.jl, microfacet.jl) and the <=8-lobe aggregate of
/root/reference/src/materials/bsdf.jl:4. Instead of a heterogeneous vector
of BxDF objects, every shading point carries a ``Lobes`` SoA of up to
``MAX_LOBES`` slots; eval/pdf/sample compute every lobe kind's formula for
every lane and select by the per-slot kind code — branchless VPU-friendly
dispatch, with all divisions guarded so inactive branches stay finite.

All directions here are in the local shading frame (normal = +z).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..core import math as m
from . import fresnel as fr
from . import ggx

F32 = jnp.float32

MAX_LOBES = 8  # reference bsdf.jl:4

# Type flags (reference bxdf.jl:1-7).
BSDF_REFLECTION = 1 << 0
BSDF_TRANSMISSION = 1 << 1
BSDF_DIFFUSE = 1 << 2
BSDF_GLOSSY = 1 << 3
BSDF_SPECULAR = 1 << 4
BSDF_ALL = (
    BSDF_REFLECTION | BSDF_TRANSMISSION | BSDF_DIFFUSE | BSDF_GLOSSY | BSDF_SPECULAR
)

# Lobe kinds.
NONE = 0
LAMBERTIAN_REFLECTION = 1
LAMBERTIAN_TRANSMISSION = 2
SPECULAR_REFLECTION = 3
SPECULAR_TRANSMISSION = 4
FRESNEL_SPECULAR = 5
OREN_NAYAR = 6
MICROFACET_REFLECTION = 7
MICROFACET_TRANSMISSION = 8

KIND_FLAGS = {
    NONE: 0,
    LAMBERTIAN_REFLECTION: BSDF_REFLECTION | BSDF_DIFFUSE,
    LAMBERTIAN_TRANSMISSION: BSDF_TRANSMISSION | BSDF_DIFFUSE,
    SPECULAR_REFLECTION: BSDF_REFLECTION | BSDF_SPECULAR,
    SPECULAR_TRANSMISSION: BSDF_TRANSMISSION | BSDF_SPECULAR,
    FRESNEL_SPECULAR: BSDF_REFLECTION | BSDF_TRANSMISSION | BSDF_SPECULAR,
    OREN_NAYAR: BSDF_REFLECTION | BSDF_DIFFUSE,
    MICROFACET_REFLECTION: BSDF_REFLECTION | BSDF_GLOSSY,
    MICROFACET_TRANSMISSION: BSDF_TRANSMISSION | BSDF_GLOSSY,
}
_FLAG_TABLE = np.asarray(
    [KIND_FLAGS[k] for k in range(len(KIND_FLAGS))], jnp.int32
)

# Transport modes (reference Trace.jl:21-23).
RADIANCE = 0
IMPORTANCE = 1


class LobeParams(NamedTuple):
    """Per-slot lobe parameters; every field is an array over arbitrary
    leading batch dims (typically [N] after a gather or [N, MAX_LOBES])."""

    kind: jnp.ndarray    # int32 kind code; NONE = inactive
    c0: jnp.ndarray      # [..., 3] primary color (R for reflectors, T for
                         # transmitters, R for FresnelSpecular)
    c1: jnp.ndarray      # [..., 3] secondary color (FresnelSpecular T)
    eta_a: jnp.ndarray   # dielectric IOR above / incident side
    eta_b: jnp.ndarray   # dielectric IOR below / transmitted side
    a: jnp.ndarray       # GGX alpha_x | OrenNayar A
    b: jnp.ndarray       # GGX alpha_y | OrenNayar B
    fr_kind: jnp.ndarray # fresnel.FRESNEL_* code
    fr_eta: jnp.ndarray  # [..., 3] conductor eta
    fr_k: jnp.ndarray    # [..., 3] conductor k


def lobe_flags(kind):
    # asarray inside the trace: _FLAG_TABLE stays host numpy at module
    # scope (device consts d2h at trace — relay poison).
    return jnp.asarray(_FLAG_TABLE)[kind]


def matches_flags(kind, type_flags):
    """BxDF type-matching `&` (reference bxdf.jl:9-11)."""
    f = lobe_flags(kind)
    return (f & type_flags) == f


def empty_params(batch_shape) -> LobeParams:
    z = jnp.zeros(batch_shape, F32)
    z3 = jnp.zeros(batch_shape + (3,), F32)
    zi = jnp.zeros(batch_shape, jnp.int32)
    return LobeParams(zi, z3, z3, z + 1.0, z + 1.0, z, z, zi, z3, z3)


def _safe_div(a, b, eps=1e-12):
    return a / jnp.where(jnp.abs(b) < eps, 1.0, b)


def _fresnel_rgb(p: LobeParams, cos_i):
    return fr.evaluate(p.fr_kind, cos_i, p.eta_a, p.eta_b, p.fr_eta, p.fr_k)


# ---------------------------------------------------------------------------
# f(wo, wi)
# ---------------------------------------------------------------------------


def _f_oren_nayar(p: LobeParams, wo, wi):
    """(reference microfacet.jl:6-42; PBRT formula — the reference's
    `abs(cos_θ(wi) > abs(cos_θ(wo)))` precedence bug is not replicated)."""
    sin_i = m.sin_theta(wi)
    sin_o = m.sin_theta(wo)
    d_cos = m.cos_phi(wi) * m.cos_phi(wo) + m.sin_phi(wi) * m.sin_phi(wo)
    max_cos = jnp.where(
        (sin_i > 1e-4) & (sin_o > 1e-4), jnp.maximum(0.0, d_cos), 0.0
    )
    abs_ci = jnp.abs(m.cos_theta(wi))
    abs_co = jnp.abs(m.cos_theta(wo))
    i_bigger = abs_ci > abs_co
    sin_alpha = jnp.where(i_bigger, sin_o, sin_i)
    tan_beta = jnp.where(
        i_bigger, _safe_div(sin_i, abs_ci), _safe_div(sin_o, abs_co)
    )
    scale = m.INV_PI * (p.a + p.b * max_cos * sin_alpha * tan_beta)
    return p.c0 * scale[..., None]


def _f_microfacet_reflection(p: LobeParams, wo, wi):
    """(reference microfacet.jl:204-238)."""
    cos_o = jnp.abs(m.cos_theta(wo))
    cos_i = jnp.abs(m.cos_theta(wi))
    wh = wi + wo
    degen = (cos_i < 1e-12) | (cos_o < 1e-12) | (m.length_squared(wh) < 1e-16)
    wh = m.normalize(jnp.where(degen[..., None], jnp.asarray([0.0, 0.0, 1.0], F32), wh))
    f_val = _fresnel_rgb(p, m.dot(wi, m.face_forward(wh, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], F32), wh.shape))))
    d = ggx.distribution(wh, p.a, p.b)
    g = ggx.g(wo, wi, p.a, p.b)
    spec = p.c0 * f_val * _safe_div(d * g, 4.0 * cos_i * cos_o)[..., None]
    return jnp.where(degen[..., None], 0.0, spec)


def _f_microfacet_transmission(p: LobeParams, wo, wi, mode):
    """(reference microfacet.jl:261-306)."""
    same = m.same_hemisphere(wo, wi)
    cos_o = m.cos_theta(wo)
    cos_i = m.cos_theta(wi)
    eta = jnp.where(cos_o > 0.0, p.eta_b / p.eta_a, p.eta_a / p.eta_b)
    wh = wo + wi * eta[..., None]
    degen = (jnp.abs(cos_i) < 1e-12) | (jnp.abs(cos_o) < 1e-12) | (
        m.length_squared(wh) < 1e-16
    )
    wh = m.normalize(jnp.where(degen[..., None], jnp.asarray([0.0, 0.0, 1.0], F32), wh))
    wh = jnp.where((m.cos_theta(wh) < 0.0)[..., None], -wh, wh)
    same_side = m.dot(wo, wh) * m.dot(wi, wh) > 0.0
    f_diel = fr.fresnel_dielectric(m.dot(wo, wh), p.eta_a, p.eta_b)
    sqrt_denom = m.dot(wo, wh) + eta * m.dot(wi, wh)
    factor = jnp.where(jnp.asarray(mode == RADIANCE), 1.0 / eta, jnp.ones_like(eta))
    d = ggx.distribution(wh, p.a, p.b)
    g = ggx.g(wo, wi, p.a, p.b)
    val = (1.0 - f_diel) * jnp.abs(
        _safe_div(
            d * g * eta * eta * jnp.abs(m.dot(wi, wh)) * jnp.abs(m.dot(wo, wh))
            * factor * factor,
            cos_i * cos_o * sqrt_denom * sqrt_denom,
        )
    )
    out = p.c0 * val[..., None]
    return jnp.where((same | degen | same_side)[..., None], 0.0, out)


def f(p: LobeParams, wo, wi, mode=RADIANCE):
    """Evaluate a lobe's f(wo, wi) with masked kind-dispatch -> [..., 3].
    Delta lobes return 0 (reference specular.jl)."""
    k = p.kind
    out = jnp.zeros_like(p.c0)

    lam_r = p.c0 * m.INV_PI
    out = jnp.where((k == LAMBERTIAN_REFLECTION)[..., None], lam_r, out)
    out = jnp.where((k == LAMBERTIAN_TRANSMISSION)[..., None], lam_r, out)
    out = jnp.where((k == OREN_NAYAR)[..., None], _f_oren_nayar(p, wo, wi), out)
    out = jnp.where(
        (k == MICROFACET_REFLECTION)[..., None],
        _f_microfacet_reflection(p, wo, wi),
        out,
    )
    out = jnp.where(
        (k == MICROFACET_TRANSMISSION)[..., None],
        _f_microfacet_transmission(p, wo, wi, mode),
        out,
    )
    # NO blanket hemisphere zeroing: the reference's per-lobe f() carries
    # no same-hemisphere check (lambertian.jl:22,57, microfacet.jl:21,221)
    # — the reflection-vs-transmission side decision belongs to the BSDF
    # wrapper via the GEOMETRIC normal (bsdf.jl:86, bsdf.py:_refl_trans_
    # mask). Zeroing on the SHADING hemisphere here blacked out valid
    # lighting wherever interpolated normals tilt across the geometric
    # plane (e.g. the spheres.jl wall, whose shared floor vertices carry
    # (0,1,0) normals). Only MicrofacetTransmission checks hemispheres in
    # the reference (microfacet.jl:283), inside its own evaluator above.
    # (pdf() keeps its hemisphere masks: the reference's compute_pdf does
    # check, bxdf.jl:23-25 / lambertian.jl:85-89.)
    return out


# ---------------------------------------------------------------------------
# pdf(wo, wi)
# ---------------------------------------------------------------------------


def pdf(p: LobeParams, wo, wi):
    """Per-lobe solid-angle pdf with masked kind-dispatch -> [...]."""
    k = p.kind
    same = m.same_hemisphere(wo, wi)
    cos_pdf = jnp.abs(m.cos_theta(wi)) * m.INV_PI

    out = jnp.zeros(k.shape, F32)
    diffuse_r = (k == LAMBERTIAN_REFLECTION) | (k == OREN_NAYAR)
    out = jnp.where(diffuse_r & same, cos_pdf, out)
    out = jnp.where((k == LAMBERTIAN_TRANSMISSION) & ~same, cos_pdf, out)

    # Microfacet reflection.
    wh_r = wo + wi
    wh_r_ok = m.length_squared(wh_r) > 1e-16
    wh_rn = m.normalize(jnp.where(wh_r_ok[..., None], wh_r, jnp.asarray([0.0, 0.0, 1.0], F32)))
    pdf_mr = _safe_div(ggx.pdf_wh(wo, wh_rn, p.a, p.b), 4.0 * m.dot(wo, wh_rn))
    out = jnp.where((k == MICROFACET_REFLECTION) & same & wh_r_ok, pdf_mr, out)

    # Microfacet transmission.
    eta = jnp.where(m.cos_theta(wo) > 0.0, p.eta_b / p.eta_a, p.eta_a / p.eta_b)
    wh_t = wo + wi * eta[..., None]
    wh_t_ok = m.length_squared(wh_t) > 1e-16
    wh_tn = m.normalize(jnp.where(wh_t_ok[..., None], wh_t, jnp.asarray([0.0, 0.0, 1.0], F32)))
    same_side = m.dot(wo, wh_tn) * m.dot(wi, wh_tn) > 0.0
    sqrt_denom = m.dot(wo, wh_tn) + eta * m.dot(wi, wh_tn)
    dwh_dwi = jnp.abs(
        _safe_div(eta * eta * m.dot(wi, wh_tn), sqrt_denom * sqrt_denom)
    )
    pdf_mt = ggx.pdf_wh(wo, wh_tn, p.a, p.b) * dwh_dwi
    out = jnp.where(
        (k == MICROFACET_TRANSMISSION) & ~same & wh_t_ok & ~same_side, pdf_mt, out
    )
    return out


# ---------------------------------------------------------------------------
# sample_f(wo, u)
# ---------------------------------------------------------------------------


class LobeSample(NamedTuple):
    wi: jnp.ndarray        # [..., 3]
    f: jnp.ndarray         # [..., 3]
    pdf: jnp.ndarray       # [...]
    sampled_flags: jnp.ndarray  # int32: actual sampled type (FresnelSpecular
                                # reports the chosen branch)


def sample(p: LobeParams, wo, u, mode=RADIANCE) -> LobeSample:
    """Sample an incident direction from one lobe per lane.

    u: [..., 2] uniform samples (u[...,0] doubles as the FresnelSpecular
    branch coin, pre-remapped by the BSDF aggregate like the reference's
    lobe-pick remap).
    """
    k = p.kind
    zf = jnp.zeros(k.shape, F32)
    flags = lobe_flags(k)

    # --- cosine-hemisphere family (Lambertian refl/trans, OrenNayar) -------
    wi_cos = m.cosine_sample_hemisphere(u)
    flip_to_wo = jnp.where(
        (m.cos_theta(wo) < 0.0)[..., None],
        jnp.asarray([1.0, 1.0, -1.0], F32),
        jnp.asarray([1.0, 1.0, 1.0], F32),
    )
    wi_refl = wi_cos * flip_to_wo
    wi_trans = wi_cos * -flip_to_wo

    # --- specular reflection -----------------------------------------------
    wi_sr = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)
    cos_sr = m.cos_theta(wi_sr)
    f_sr = _fresnel_rgb(p, cos_sr) * p.c0 / jnp.maximum(jnp.abs(cos_sr), 1e-12)[..., None]

    # --- specular transmission ---------------------------------------------
    entering = m.cos_theta(wo) > 0.0
    eta_i = jnp.where(entering, p.eta_a, p.eta_b)
    eta_t = jnp.where(entering, p.eta_b, p.eta_a)
    n_ff = jnp.where(
        entering[..., None],
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], F32), wo.shape),
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], F32), wo.shape),
    )
    refr_ok, wi_st = m.refract(wo, n_ff, eta_i / eta_t)
    cos_st = m.cos_theta(wi_st)
    fr_st = fr.fresnel_dielectric(cos_st, p.eta_a, p.eta_b)
    eta_scale = jnp.where(
        jnp.asarray(mode == RADIANCE), (eta_i / eta_t) ** 2, jnp.ones_like(eta_i)
    )
    f_st = (
        p.c0
        * ((1.0 - fr_st) * eta_scale / jnp.maximum(jnp.abs(cos_st), 1e-12))[..., None]
    )
    f_st = jnp.where(refr_ok[..., None], f_st, 0.0)

    # --- Fresnel specular (coin flip on F, reference specular.jl:107-173) --
    fr_coin = fr.fresnel_dielectric(m.cos_theta(wo), p.eta_a, p.eta_b)
    take_refl = u[..., 0] < fr_coin
    f_fs_r = p.c0 * (fr_coin / jnp.maximum(jnp.abs(cos_sr), 1e-12))[..., None]
    f_fs_t = (
        p.c1
        * ((1.0 - fr_coin) * eta_scale / jnp.maximum(jnp.abs(cos_st), 1e-12))[..., None]
    )
    f_fs_t = jnp.where(refr_ok[..., None], f_fs_t, 0.0)
    wi_fs = jnp.where(take_refl[..., None], wi_sr, wi_st)
    f_fs = jnp.where(take_refl[..., None], f_fs_r, f_fs_t)
    pdf_fs = jnp.where(take_refl, fr_coin, 1.0 - fr_coin)
    flags_fs = jnp.where(
        take_refl,
        jnp.int32(BSDF_SPECULAR | BSDF_REFLECTION),
        jnp.int32(BSDF_SPECULAR | BSDF_TRANSMISSION),
    )

    # --- microfacet reflection ---------------------------------------------
    wh = ggx.sample_wh(wo, u, p.a, p.b)
    wo_dot_wh = m.dot(wo, wh)
    wi_mr = -wo + 2.0 * wo_dot_wh[..., None] * wh
    mr_ok = (wo_dot_wh > 0.0) & m.same_hemisphere(wo, wi_mr) & (
        jnp.abs(m.cos_theta(wo)) > 1e-12
    )
    pdf_mr = _safe_div(ggx.pdf_wh(wo, wh, p.a, p.b), 4.0 * wo_dot_wh)

    # --- microfacet transmission -------------------------------------------
    eta_refr = jnp.where(entering, p.eta_a / p.eta_b, p.eta_b / p.eta_a)
    wh_ff = m.face_forward(wh, wo)
    mt_ok0, wi_mt = m.refract(wo, wh_ff, eta_refr)
    mt_ok = (
        mt_ok0
        & (wo_dot_wh > 0.0)
        & ~m.same_hemisphere(wo, wi_mt)
        & (jnp.abs(m.cos_theta(wo)) > 1e-12)
    )

    # --- gather by kind -----------------------------------------------------
    def pick3(pairs, default):
        out = default
        for kk, v in pairs:
            out = jnp.where((k == kk)[..., None], v, out)
        return out

    def pick1(pairs, default):
        out = default
        for kk, v in pairs:
            out = jnp.where(k == kk, v, out)
        return out

    wi = pick3(
        [
            (LAMBERTIAN_REFLECTION, wi_refl),
            (OREN_NAYAR, wi_refl),
            (LAMBERTIAN_TRANSMISSION, wi_trans),
            (SPECULAR_REFLECTION, wi_sr),
            (SPECULAR_TRANSMISSION, wi_st),
            (FRESNEL_SPECULAR, wi_fs),
            (MICROFACET_REFLECTION, wi_mr),
            (MICROFACET_TRANSMISSION, wi_mt),
        ],
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], F32), wo.shape),
    )

    # Non-delta kinds: f and pdf from the shared eval paths at the sampled wi.
    f_eval = f(p, wo, wi, mode)
    pdf_eval = pdf(p, wo, wi)

    f_out = pick3(
        [
            (SPECULAR_REFLECTION, f_sr),
            (SPECULAR_TRANSMISSION, f_st),
            (FRESNEL_SPECULAR, f_fs),
        ],
        f_eval,
    )
    pdf_out = pick1(
        [
            (SPECULAR_REFLECTION, jnp.ones_like(zf)),
            (SPECULAR_TRANSMISSION, jnp.where(refr_ok, 1.0, 0.0)),
            (FRESNEL_SPECULAR, pdf_fs),
            (MICROFACET_REFLECTION, jnp.where(mr_ok, pdf_mr, 0.0)),
        ],
        pdf_eval,
    )
    # Failed samples -> pdf 0, f 0.
    fail = (
        ((k == SPECULAR_TRANSMISSION) & ~refr_ok)
        | ((k == MICROFACET_REFLECTION) & ~mr_ok)
        | ((k == MICROFACET_TRANSMISSION) & ~mt_ok)
        | (k == NONE)
    )
    f_out = jnp.where(fail[..., None], 0.0, f_out)
    pdf_out = jnp.where(fail, 0.0, pdf_out)

    sampled_flags = pick1([(FRESNEL_SPECULAR, flags_fs)], flags)
    return LobeSample(wi, f_out, pdf_out, sampled_flags)
