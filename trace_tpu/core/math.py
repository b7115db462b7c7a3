"""Math & sampling core.

TPU-native counterpart of the reference's module-root utilities
(/root/reference/src/Trace.jl:48-168): Monte-Carlo sampling helpers,
shading-frame trigonometry, `reflect`, `face_forward`, `coordinate_system`,
spherical directions. Everything is float32 and batched: vectors are arrays
with a trailing dimension of 3 and functions broadcast over leading dims.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

F32 = jnp.float32
# Host (numpy) scalars: module-level DEVICE constants get read back
# (d2h) when jit embeds them at trace time, which permanently degrades
# the TPU relay's dispatch latency. numpy scalars embed for free.
PI = np.float32(3.1415926535897932)
INV_PI = np.float32(1.0 / 3.1415926535897932)
INF = np.float32(np.inf)

# The reference zero-snaps near-zero quantities with Julia's `isapprox`
# (x ≈ 0 ⇔ |x| ≤ sqrt(eps(Float32)) relative... for comparison against the
# literal 0 Julia uses absolute tolerance 0). We use a small epsilon where the
# reference relies on `≈ 0` against floats to avoid division blow-ups.
EPS = np.float32(1e-8)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length_squared(a):
    return jnp.sum(a * a, axis=-1)


def length(a):
    return jnp.sqrt(length_squared(a))


def normalize(a):
    # Zero-guard only (no absolute EPS clamp): an absolute floor silently
    # returns non-unit vectors in very-small-unit scenes; the reference's
    # normalize divides by the true norm, underflowing to the same f32
    # floor this guard handles (n == 0 with nonzero a is the f32
    # sum-of-squares underflow — the vector passes through unchanged).
    n = length(a)
    return a / jnp.where(n == 0.0, 1.0, n)[..., None]


def distance(a, b):
    return length(a - b)


def distance_squared(a, b):
    return length_squared(a - b)


def lerp(a, b, t):
    return (1.0 - t) * a + t * b


def vec(x, y, z, dtype=F32):
    return jnp.stack(
        [jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)],
        axis=-1,
    )


def face_forward(n, v):
    """Flip `n` so it lies in the hemisphere of `v` (Trace.jl:168)."""
    return jnp.where((dot(n, v) < 0.0)[..., None], -n, n)


def reflect(wo, n):
    """Reflect `wo` about `n` (Trace.jl:126)."""
    return -wo + 2.0 * dot(wo, n)[..., None] * n


def refract(wi, n, eta):
    """Refract `wi` about normal `n` with relative IOR `eta`.

    Mirrors /root/reference/src/reflection/bxdf.jl:52-62. Returns
    (valid, wt): valid is False on total internal reflection.
    """
    cos_ti = dot(n, wi)
    sin2_ti = jnp.maximum(0.0, 1.0 - cos_ti * cos_ti)
    sin2_tt = eta * eta * sin2_ti
    valid = sin2_tt < 1.0
    cos_tt = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_tt))
    wt = -eta[..., None] * wi + (eta * cos_ti - cos_tt)[..., None] * n
    return valid, jnp.where(valid[..., None], wt, 0.0)


def unpack3(v):
    """Split [..., 3] into three [...] component arrays WITHOUT
    minor-dim strided slices.

    ``v[..., k]`` on a TPU-tiled [N, 3] array is a strided window
    extraction that blocks fusion; one ``moveaxis`` transpose is a
    single tile-shuffle op, after which the component reads are
    contiguous rows. Bit-identical values, different data movement.
    The measured basis for the whole layout question is
    scripts/micro_unpacked.py (ARCHITECTURE.md §7c): planar component
    arrays beat [N, 3] 2.2x on a composed level loop, which is why the
    hot path now lives in trace_tpu/wavefront; this helper is the
    packed path's mitigation at its conversion boundaries."""
    vt = jnp.moveaxis(v, -1, 0)
    return vt[0], vt[1], vt[2]


def pack3(x, y, z):
    """Inverse of unpack3: three [...] components -> [..., 3] via one
    transpose instead of an interleaving stack (same rationale)."""
    return jnp.moveaxis(jnp.stack([x, y, z], axis=0), 0, -1)


def mat3_apply(m33, v):
    """[..., 3, 3] @ [..., 3] -> [..., 3] as exact f32 VPU arithmetic.

    jnp.einsum / @ lower 3x3 transform applications to MXU matmuls whose
    default TPU precision multiplies in bf16 — ~7 bits lost, enough to
    break on-surface geometry (measured: 50% false shadow self-occlusion
    on unit-scale spheres). Explicit component arithmetic stays on the
    VPU in full f32 and fuses with its consumers. Components move via
    unpack3/pack3 (one transpose each way) — see unpack3 for why.
    """
    v0, v1, v2 = unpack3(v)
    mt = jnp.moveaxis(jnp.moveaxis(m33, -1, 0), -1, 0)  # [3r, 3c, ...]
    out = [
        mt[i, 0] * v0 + mt[i, 1] * v1 + mt[i, 2] * v2
        for i in range(3)
    ]
    return pack3(*out)


def mat3_apply_t(m33, v):
    """Transpose apply: [..., 3, 3].T @ [..., 3] (normals' inverse
    transpose rule) in exact f32 — see mat3_apply."""
    v0, v1, v2 = unpack3(v)
    mt = jnp.moveaxis(jnp.moveaxis(m33, -1, 0), -1, 0)  # [3r, 3c, ...]
    out = [
        mt[0, i] * v0 + mt[1, i] * v1 + mt[2, i] * v2
        for i in range(3)
    ]
    return pack3(*out)


def coordinate_system(v1):
    """Build an orthonormal basis around v1 (Trace.jl:139-146)."""
    c = jnp.abs(v1[..., 0]) > jnp.abs(v1[..., 1])
    inv_a = 1.0 / jnp.sqrt(
        jnp.where(
            c,
            v1[..., 0] ** 2 + v1[..., 2] ** 2,
            v1[..., 1] ** 2 + v1[..., 2] ** 2,
        )
    )
    v2 = jnp.where(
        c[..., None],
        vec(-v1[..., 2], jnp.zeros_like(inv_a), v1[..., 0]) * inv_a[..., None],
        vec(jnp.zeros_like(inv_a), v1[..., 2], -v1[..., 1]) * inv_a[..., None],
    )
    return v1, v2, cross(v1, v2)


# ---------------------------------------------------------------------------
# Monte-Carlo sampling helpers (Trace.jl:48-96)
# ---------------------------------------------------------------------------


def concentric_sample_disk(u):
    """Map uniform [0,1]^2 samples to the unit disk (Trace.jl:48-61)."""
    offset = 2.0 * u - 1.0
    ox, oy = offset[..., 0], offset[..., 1]
    degenerate = (jnp.abs(ox) < EPS) & (jnp.abs(oy) < EPS)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    # Guard divisions on the branch not taken.
    safe_ox = jnp.where(jnp.abs(ox) < EPS, 1.0, ox)
    safe_oy = jnp.where(jnp.abs(oy) < EPS, 1.0, oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(
        use_x,
        (oy / safe_ox) * (PI / 4.0),
        PI / 2.0 - (ox / safe_oy) * (PI / 4.0),
    )
    p = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    return jnp.where(degenerate[..., None], 0.0, p)


def cosine_sample_hemisphere(u):
    """Cosine-weighted hemisphere sample (Trace.jl:63-67)."""
    d = concentric_sample_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return vec(d[..., 0], d[..., 1], z)


def uniform_sample_sphere(u):
    """Uniform sphere sample (Trace.jl:69-74)."""
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u[..., 1]
    return vec(r * jnp.cos(phi), r * jnp.sin(phi), z)


def uniform_sample_cone(u, cos_t_max):
    """Uniform sample inside a cone around +z (Trace.jl:76-81)."""
    cos_t = 1.0 - u[..., 0] + u[..., 0] * cos_t_max
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = u[..., 1] * 2.0 * PI
    return vec(jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t)


def uniform_sphere_pdf():
    return F32(1.0 / (4.0 * 3.1415926535897932))


def uniform_cone_pdf(cos_t_max):
    return 1.0 / (2.0 * PI * (1.0 - cos_t_max))


def uniform_sample_triangle(u):
    """Uniform barycentric coordinates on a triangle (PBRT)."""
    su0 = jnp.sqrt(u[..., 0])
    return jnp.stack([1.0 - su0, u[..., 1] * su0], axis=-1)


# ---------------------------------------------------------------------------
# Shading-frame trigonometry (Trace.jl:109-126). Directions are expressed in
# the local reflection frame where the normal is +z.
# ---------------------------------------------------------------------------


def cos_theta(w):
    return w[..., 2]


def cos2_theta(w):
    return w[..., 2] * w[..., 2]


def sin2_theta(w):
    return jnp.maximum(0.0, 1.0 - cos2_theta(w))


def sin_theta(w):
    return jnp.sqrt(sin2_theta(w))


def tan_theta(w):
    return sin_theta(w) / cos_theta(w)


def tan2_theta(w):
    return sin2_theta(w) / cos2_theta(w)


def cos_phi(w):
    s = sin_theta(w)
    return jnp.where(s < 1e-8, 1.0, jnp.clip(w[..., 0] / jnp.where(s < 1e-8, 1.0, s), -1.0, 1.0))


def sin_phi(w):
    s = sin_theta(w)
    return jnp.where(s < 1e-8, 1.0, jnp.clip(w[..., 1] / jnp.where(s < 1e-8, 1.0, s), -1.0, 1.0))


def same_hemisphere(w, wp):
    return w[..., 2] * wp[..., 2] > 0


def spherical_direction(sin_t, cos_t, phi):
    """(Trace.jl:148-150)."""
    return vec(sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t)


def spherical_theta(v):
    return jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))


def spherical_phi(v):
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0, p + 2.0 * PI, p)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """Power heuristic for MIS (reference sppm.jl:556-562)."""
    f = (nf * f_pdf) ** 2
    g = (ng * g_pdf) ** 2
    return jnp.where(f + g > 0, f / (f + g), 0.0)
