"""Texture hierarchy.

TPU-native counterpart of /root/reference/src/textures/ (basic.jl,
mapping.jl). Textures are small composable host-side objects whose
``__call__(hit)`` evaluates to a per-lane array over the SurfaceHit batch —
constant folding, scaling and mixing are then ordinary fused XLA elementwise
ops. Spectral textures return [N, 3]; scalar textures return [N].
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import transform as T

F32 = jnp.float32


# ---------------------------------------------------------------------------
# Mappings (reference textures/mapping.jl)
# ---------------------------------------------------------------------------


class UVMapping2D:
    """(u, v) -> (su*u + du, sv*v + dv) with screen-space differentials
    (mapping.jl:9-34)."""

    def __init__(self, su=1.0, sv=1.0, du=0.0, dv=0.0):
        self.su, self.sv, self.du, self.dv = map(float, (su, sv, du, dv))

    def __call__(self, hit):
        st = jnp.stack(
            [
                self.su * hit.uv[..., 0] + self.du,
                self.sv * hit.uv[..., 1] + self.dv,
            ],
            axis=-1,
        )
        dstdx = jnp.stack([self.su * hit.dudx, self.sv * hit.dvdx], axis=-1)
        dstdy = jnp.stack([self.su * hit.dudy, self.sv * hit.dvdy], axis=-1)
        return st, dstdx, dstdy


class TransformMapping3D:
    """World point -> texture space (mapping.jl:36-58)."""

    def __init__(self, world_to_texture: T.Transform):
        self.w2t = world_to_texture

    def __call__(self, hit):
        p = T.apply_point(self.w2t, hit.p)
        dpdx = T.apply_vec(self.w2t, hit.dpdx)
        dpdy = T.apply_vec(self.w2t, hit.dpdy)
        return p, dpdx, dpdy


# ---------------------------------------------------------------------------
# Textures (reference textures/basic.jl)
# ---------------------------------------------------------------------------


class Texture:
    def __call__(self, hit):
        raise NotImplementedError


class ConstantTexture(Texture):
    """(basic.jl:4-10)."""

    def __init__(self, value):
        # Host numpy: a device-array attribute closed over by jit is
        # read back (d2h) at trace time — relay poison.
        v = np.asarray(value, np.float32)
        self.value = v
        self.is_spectral = v.ndim > 0

    def __call__(self, hit):
        n = hit.t.shape[0]
        if self.is_spectral:
            return jnp.broadcast_to(self.value, (n, 3))
        return jnp.broadcast_to(self.value, (n,))


class ScaleTexture(Texture):
    """value * scale (basic.jl:13-21)."""

    def __init__(self, value: Texture, scale: Texture):
        self.value, self.scale = value, scale

    def __call__(self, hit):
        v = self.value(hit)
        s = self.scale(hit)
        # Promote whichever side is scalar: [N] * [N,3] broadcasts in
        # EITHER direction (a scalar value with a spectral scale is legal
        # in the reference too, basic.jl:13-21).
        if v.ndim > s.ndim:
            s = s[..., None]
        elif s.ndim > v.ndim:
            v = v[..., None]
        return v * s


class MixTexture(Texture):
    """lerp(t1, t2, amount) (basic.jl:24-33)."""

    def __init__(self, t1: Texture, t2: Texture, amount: Texture):
        self.t1, self.t2, self.amount = t1, t2, amount

    def __call__(self, hit):
        a = self.amount(hit)
        v1, v2 = self.t1(hit), self.t2(hit)
        if v1.ndim > a.ndim:
            a = a[..., None]
        return (1.0 - a) * v1 + a * v2


class BilerpTexture(Texture):
    """Bilinear blend of four corner values over the mapped (s, t)
    (basic.jl:36-51)."""

    def __init__(self, mapping, v00, v01, v10, v11):
        self.mapping = mapping
        # Host numpy, like ConstantTexture: a device-array attribute
        # closed over by jit reads back d2h at trace time (relay poison).
        vs = [np.asarray(v, np.float32) for v in (v00, v01, v10, v11)]
        self.v00, self.v01, self.v10, self.v11 = vs
        self.is_spectral = vs[0].ndim > 0

    def __call__(self, hit):
        st, _, _ = self.mapping(hit)
        s, t = st[..., 0], st[..., 1]
        if self.is_spectral:
            s, t = s[..., None], t[..., None]
        return (
            (1 - s) * (1 - t) * self.v00
            + (1 - s) * t * self.v01
            + s * (1 - t) * self.v10
            + s * t * self.v11
        )


def clamp_texture(v, low=0.0, high=jnp.inf):
    """The reference clamps every evaluated texture (material.jl `clamp`)."""
    return jnp.clip(v, low, high)
