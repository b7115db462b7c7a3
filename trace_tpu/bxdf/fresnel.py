"""Fresnel reflectance.

TPU-native counterpart of /root/reference/src/reflection/bxdf.jl:74-140.
All functions broadcast over leading batch dims; the three reference Fresnel
functor types (NoOp / Dielectric / Conductor, bxdf.jl:127-140) become a
masked kind-dispatch in :func:`evaluate`.
"""
from __future__ import annotations

import jax.numpy as jnp

F32 = jnp.float32

FRESNEL_NOOP = 0
FRESNEL_DIELECTRIC = 1
FRESNEL_CONDUCTOR = 2


def fresnel_dielectric(cos_theta_i, eta_i, eta_t):
    """Unpolarized Fresnel reflectance at a dielectric boundary
    (reference bxdf.jl:74-95). cos_theta_i may be negative (exiting); the
    media are swapped in that case.
    """
    cos_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    entering = cos_i > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    cos_i = jnp.abs(cos_i)

    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    sin_t = ei / et * sin_i
    tir = sin_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))

    r_parl = (et * cos_i - ei * cos_t) / jnp.where(
        et * cos_i + ei * cos_t == 0.0, 1.0, et * cos_i + ei * cos_t
    )
    r_perp = (ei * cos_i - et * cos_t) / jnp.where(
        ei * cos_i + et * cos_t == 0.0, 1.0, ei * cos_i + et * cos_t
    )
    fr = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, fr)


def fresnel_conductor(cos_theta_i, eta_i, eta_t, k):
    """Fresnel reflectance for conductors (reference bxdf.jl:102-125).

    eta_i/eta_t/k are RGB triples [..., 3]; cos_theta_i broadcasts [...].
    """
    cos_i = jnp.clip(jnp.abs(cos_theta_i), -1.0, 1.0)[..., None]
    eta = eta_t / eta_i
    eta_k = k / eta_i

    cos2 = cos_i * cos_i
    sin2 = 1.0 - cos2
    eta2 = eta * eta
    eta_k2 = eta_k * eta_k

    t0 = eta2 - eta_k2 - sin2
    a2_plus_b2 = jnp.sqrt(jnp.maximum(0.0, t0 * t0 + 4.0 * eta2 * eta_k2))
    t1 = a2_plus_b2 + cos2
    a = jnp.sqrt(jnp.maximum(0.0, 0.5 * (a2_plus_b2 + t0)))
    t2 = 2.0 * a * cos_i
    rs = (t1 - t2) / jnp.where(t1 + t2 == 0.0, 1.0, t1 + t2)

    t3 = cos2 * a2_plus_b2 + sin2 * sin2
    t4 = t2 * sin2
    rp = rs * (t3 - t4) / jnp.where(t3 + t4 == 0.0, 1.0, t3 + t4)
    return 0.5 * (rp + rs)


def evaluate(kind, cos_theta_i, eta_a, eta_b, fr_eta, fr_k):
    """Masked Fresnel dispatch -> RGB reflectance [..., 3].

    kind: int array [...] of FRESNEL_* codes. eta_a/eta_b: scalars per lane
    (dielectric). fr_eta/fr_k: RGB per lane (conductor, with incident
    medium IOR fixed to 1 as the reference materials do).
    """
    diel = fresnel_dielectric(cos_theta_i, eta_a, eta_b)[..., None]
    ones = jnp.ones_like(fr_eta)
    cond = fresnel_conductor(cos_theta_i, ones, fr_eta, fr_k)
    out = jnp.where((kind == FRESNEL_DIELECTRIC)[..., None], diel, 1.0)
    return jnp.where((kind == FRESNEL_CONDUCTOR)[..., None], cond, out)
