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


# ---------------------------------------------------------------------------
# Image textures with mip-mapping (beyond the reference: textures/basic.jl
# stops at BilerpTexture — "no image texture, no mip-mapping" per SURVEY §2)
# ---------------------------------------------------------------------------


def _bilinear_resize(img: np.ndarray, nh: int, nw: int) -> np.ndarray:
    """Host bilinear resample of [H, W, C] to [nh, nw, C] (texel centers)."""
    h, w = img.shape[:2]
    ys = (np.arange(nh, dtype=np.float64) + 0.5) * h / nh - 0.5
    xs = (np.arange(nw, dtype=np.float64) + 0.5) * w / nw - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    a = img[y0][:, x0] * (1 - fy) * (1 - fx) + img[y0][:, x1] * (1 - fy) * fx
    b = img[y1][:, x0] * fy * (1 - fx) + img[y1][:, x1] * fy * fx
    return (a + b).astype(np.float32)


class MipMap:
    """Image pyramid with trilinear filtered lookups, PBRT-style (the
    screen-space footprint from the ray differentials picks the level).

    TPU shape: every level is packed into ONE flat host ``[T, C]`` table
    (plus tiny per-level ``dims``/``offsets`` tables), so a per-lane lookup
    at a *traced* level index is 4 dynamic-gather rows per level — no
    per-level Python branching, no device-resident state (host arrays embed
    into the executable for free; see ARCHITECTURE §5b).

    ``wrap``: "repeat" | "clamp" | "black". ``gamma=True`` sRGB-decodes
    8-bit inputs to linear radiance.
    """

    def __init__(self, image, wrap: str = "repeat", gamma: bool = False):
        assert wrap in ("repeat", "clamp", "black"), wrap
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        img = img.astype(np.float32)
        if gamma:
            img = np.where(
                img <= 0.04045, img / 12.92,
                ((img + 0.055) / 1.055) ** 2.4,
            ).astype(np.float32)
        self.is_spectral = img.ndim == 3
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[-1] == 4:  # drop alpha
            img = img[..., :3]
        h, w = img.shape[:2]
        ph = 1 << max(h - 1, 0).bit_length()
        pw = 1 << max(w - 1, 0).bit_length()
        if (ph, pw) != (h, w):  # resample up to powers of two (pbrt 10.4)
            img = _bilinear_resize(img, ph, pw)
        levels = [img]
        while levels[-1].shape[0] > 1 or levels[-1].shape[1] > 1:
            prev = levels[-1]
            hh = max(prev.shape[0] // 2, 1)
            ww = max(prev.shape[1] // 2, 1)
            r = prev.reshape(
                hh, prev.shape[0] // hh, ww, prev.shape[1] // ww, -1
            )
            levels.append(r.mean(axis=(1, 3), dtype=np.float32))
        self.wrap = wrap
        self.n_levels = len(levels)
        # Host (numpy) tables — device copies of these as attributes would
        # be read back at trace time (relay poison, ConstantTexture note).
        self.dims = np.array(
            [[l.shape[0], l.shape[1]] for l in levels], np.int32
        )
        sizes = [l.shape[0] * l.shape[1] for l in levels]
        self.offsets = np.cumsum([0] + sizes[:-1]).astype(np.int32)
        self.texels = np.concatenate(
            [l.reshape(-1, l.shape[-1]) for l in levels], axis=0
        )

    def _bilerp_level(self, lvl, s, t):
        """Bilinear lookup of [N] (s, t) at per-lane level indices [N]."""
        hw = jnp.asarray(self.dims)[lvl].astype(F32)      # [N, 2]
        h, w = hw[..., 0], hw[..., 1]
        off = jnp.asarray(self.offsets)[lvl]              # [N]
        x = s * w - 0.5
        y = t * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0

        def texel(xi, yi):
            if self.wrap == "repeat":
                xi = xi - jnp.floor(xi / w) * w
                yi = yi - jnp.floor(yi / h) * h
                valid = None
            elif self.wrap == "black":
                valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            else:
                valid = None
            xi = jnp.clip(xi, 0.0, w - 1.0)
            yi = jnp.clip(yi, 0.0, h - 1.0)
            flat = off + (yi * w + xi).astype(jnp.int32)
            v = jnp.take(jnp.asarray(self.texels), flat, axis=0)
            if valid is not None:
                v = v * valid[..., None].astype(F32)
            return v

        v = (
            ((1 - fx) * (1 - fy))[..., None] * texel(x0, y0)
            + (fx * (1 - fy))[..., None] * texel(x0 + 1, y0)
            + ((1 - fx) * fy)[..., None] * texel(x0, y0 + 1)
            + (fx * fy)[..., None] * texel(x0 + 1, y0 + 1)
        )
        return v

    def lookup(self, st, dstdx, dstdy):
        """Trilinear lookup: [N, 2] st + screen-space differentials ->
        [N, 3] (spectral) or [N] (scalar)."""
        s, t = st[..., 0], st[..., 1]
        width = jnp.maximum(
            jnp.max(jnp.abs(dstdx), axis=-1),
            jnp.max(jnp.abs(dstdy), axis=-1),
        )
        lvl = (self.n_levels - 1) + jnp.log2(jnp.maximum(width, 1e-8))
        lvl = jnp.clip(lvl, 0.0, float(self.n_levels - 1))
        l0 = jnp.floor(lvl).astype(jnp.int32)
        l1 = jnp.minimum(l0 + 1, self.n_levels - 1)
        f = (lvl - l0.astype(F32))[..., None]
        v = (1.0 - f) * self._bilerp_level(l0, s, t)
        v = v + f * self._bilerp_level(l1, s, t)
        if not self.is_spectral:
            return v[..., 0]
        return v


class ImageTexture(Texture):
    """Mip-mapped image lookup through a 2D mapping (beyond-reference)."""

    def __init__(self, mapping, mipmap, scale: float = 1.0):
        self.mapping = mapping
        self.mip = mipmap if isinstance(mipmap, MipMap) else MipMap(mipmap)
        self.scale = float(scale)
        self.is_spectral = self.mip.is_spectral

    def __call__(self, hit):
        st, dstdx, dstdy = self.mapping(hit)
        v = self.mip.lookup(st, dstdx, dstdy)
        return v * self.scale if self.scale != 1.0 else v


def image_texture(path: str, mapping=None, wrap: str = "repeat",
                  gamma: bool = True, scale: float = 1.0) -> ImageTexture:
    """Load a PNG into a mip-mapped :class:`ImageTexture` (8-bit PNGs are
    sRGB-decoded to linear by default)."""
    from ..io.png import read_png

    img = read_png(path)
    return ImageTexture(
        mapping if mapping is not None else UVMapping2D(),
        MipMap(img, wrap=wrap, gamma=gamma),
        scale=scale,
    )
