"""Trowbridge-Reitz (GGX) microfacet distribution.

TPU-native counterpart of /root/reference/src/reflection/microfacet.jl:53-201:
anisotropic D, Smith lambda/G, visible-NDF sampling (trowbridge_reitz_sample)
and the PBRT roughness->alpha remap. All functions operate in the local
shading frame and broadcast over leading batch dims.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m

F32 = jnp.float32


def roughness_to_alpha(roughness):
    """(reference microfacet.jl:79-84)."""
    r = jnp.maximum(jnp.asarray(roughness, F32), 1e-3)
    x = jnp.log(r)
    return (
        1.62142
        + 0.819955 * x
        + 0.1734 * x**2
        + 0.0171201 * x**3
        + 0.000640711 * x**4
    )


def distribution(wh, alpha_x, alpha_y):
    """D(wh) (reference microfacet.jl:98-110)."""
    tan2 = m.tan2_theta(wh)
    cos4 = m.cos2_theta(wh) ** 2
    e = (
        m.cos_phi(wh) ** 2 / jnp.maximum(alpha_x**2, 1e-12)
        + m.sin_phi(wh) ** 2 / jnp.maximum(alpha_y**2, 1e-12)
    ) * tan2
    d = 1.0 / (m.PI * alpha_x * alpha_y * cos4 * (1.0 + e) ** 2)
    return jnp.where(jnp.isfinite(tan2) & (cos4 > 1e-16), d, 0.0)


def _lambda(w, alpha_x, alpha_y):
    """Smith masking lambda (reference microfacet.jl:65-77)."""
    abs_tan = jnp.abs(m.tan_theta(w))
    alpha = jnp.sqrt(
        m.cos_phi(w) ** 2 * alpha_x**2 + m.sin_phi(w) ** 2 * alpha_y**2
    )
    a2t2 = (alpha * abs_tan) ** 2
    lam = (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0
    return jnp.where(jnp.isfinite(abs_tan), lam, 0.0)


def g1(w, alpha_x, alpha_y):
    return 1.0 / (1.0 + _lambda(w, alpha_x, alpha_y))


def g(wo, wi, alpha_x, alpha_y):
    return 1.0 / (
        1.0 + _lambda(wo, alpha_x, alpha_y) + _lambda(wi, alpha_x, alpha_y)
    )


def _sample11(cos_theta, u1, u2):
    """Slope-space visible-NDF sampling for alpha=1
    (reference trowbridge_reitz_sample, microfacet.jl:112-171)."""
    # Normal-incidence special case.
    r_ni = jnp.sqrt(u1 / jnp.maximum(1.0 - u1, 1e-12))
    phi_ni = 2.0 * m.PI * u2
    sx_ni = r_ni * jnp.cos(phi_ni)
    sy_ni = r_ni * jnp.sin(phi_ni)

    cos_t = jnp.minimum(cos_theta, 0.9998)  # keep general path finite
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    tan_t = sin_t / cos_t
    a = 1.0 / tan_t
    g1_ = 2.0 / (1.0 + jnp.sqrt(1.0 + 1.0 / (a * a)))

    A = 2.0 * u1 / g1_ - 1.0
    tmp = jnp.minimum(1.0 / jnp.where(A * A - 1.0 == 0.0, 1e-10, A * A - 1.0), 1e10)
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
    return jnp.where(ni, sx_ni, slope_x), jnp.where(ni, sy_ni, slope_y)


def sample_wh(wo, u, alpha_x, alpha_y):
    """Sample a visible microfacet normal (reference microfacet.jl:173-201)."""
    flip = m.cos_theta(wo) < 0.0
    w = jnp.where(flip[..., None], -wo, wo)

    # Stretch to alpha=1 configuration.
    wi_s = m.normalize(
        jnp.stack(
            [alpha_x * w[..., 0], alpha_y * w[..., 1], w[..., 2]], axis=-1
        )
    )
    sx, sy = _sample11(m.cos_theta(wi_s), u[..., 0], u[..., 1])

    # Rotate slopes into the azimuth of wi_s.
    cp, sp = m.cos_phi(wi_s), m.sin_phi(wi_s)
    tmp = cp * sx - sp * sy
    sy = sp * sx + cp * sy
    sx = tmp

    # Unstretch and build the normal.
    sx = alpha_x * sx
    sy = alpha_y * sy
    wh = m.normalize(jnp.stack([-sx, -sy, jnp.ones_like(sx)], axis=-1))
    return jnp.where(flip[..., None], -wh, wh)


def pdf_wh(wo, wh, alpha_x, alpha_y):
    """Visible-normal pdf D(wh) G1(wo) |wo.wh| / |cos(wo)|."""
    return (
        distribution(wh, alpha_x, alpha_y)
        * g1(wo, alpha_x, alpha_y)
        * jnp.abs(m.dot(wo, wh))
        / jnp.maximum(jnp.abs(m.cos_theta(wo)), 1e-12)
    )
