"""Planar material dispatch: texture eval -> static-width lobe slots.

Twin of materials/materials.py compute_scattering (reference
material.jl functors) for the planar wavefront path. Each supported
material class contributes its lobes to the static slot tuple for the
lanes it owns; the slot count is the max any scene material needs
(matte/mirror/metal 1, glass/plastic 2) — not MAX_LOBES=8.

Non-constant textures evaluate through a small packed-hit facade (they
read .uv/.p/.t/.dudx...), so every existing Texture works unchanged;
ConstantTexture (every reference scene) short-circuits to broadcast
host scalars.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..bxdf import fresnel as fr
from ..bxdf import ggx
from ..bxdf import lobes as lb
from ..core import vec as V
from ..core.vec import V3
from ..materials import materials as M
from ..materials.textures import ConstantTexture
from . import shade as S
from .geom import HitP

F32 = jnp.float32


class _TexHit:
    """Packed-hit facade over a HitP for Texture.__call__."""

    def __init__(self, hp: HitP):
        self._hp = hp
        self.t = hp.t
        self.dudx, self.dudy = hp.dudx, hp.dudy
        self.dvdx, self.dvdy = hp.dvdx, hp.dvdy

    @property
    def uv(self):
        return jnp.stack([self._hp.u, self._hp.v], axis=-1)

    @property
    def p(self):
        return self._hp.p.arr()

    @property
    def dpdx(self):
        return self._hp.dpdx.arr()

    @property
    def dpdy(self):
        return self._hp.dpdy.arr()


def _tex_rgb(tex, hit: HitP, facade_cache) -> V3:
    n = hit.t.shape[0]
    if isinstance(tex, ConstantTexture) and tex.is_spectral:
        v = np.asarray(tex.value, np.float32)
        return V3.full((n,), v[0], v[1], v[2])
    if facade_cache[0] is None:
        facade_cache[0] = _TexHit(hit)
    return V3.of(tex(facade_cache[0]))


def _tex_scalar(tex, hit: HitP, facade_cache):
    n = hit.t.shape[0]
    if isinstance(tex, ConstantTexture) and not tex.is_spectral:
        return jnp.full((n,), np.float32(tex.value), F32)
    if facade_cache[0] is None:
        facade_cache[0] = _TexHit(hit)
    return tex(facade_cache[0])


def _clamp3(v: V3) -> V3:
    return V.maximum(v, 0.0)


def _set_slot(slots, i, mask, **fields):
    """Write fields into slot ``i`` where mask holds (bsdf.set_lobe twin,
    static slot index)."""
    s = slots[i]
    upd = {}
    for name, val in fields.items():
        cur = getattr(s, name)
        if isinstance(cur, V3):
            if not isinstance(val, V3):
                val = V3.full(cur.x.shape, *np.broadcast_to(
                    np.asarray(val, np.float32), (3,)))
            upd[name] = V.where(mask, val, cur)
        else:
            val = jnp.broadcast_to(jnp.asarray(val, cur.dtype), cur.shape)
            upd[name] = jnp.where(mask, val, cur)
    slots = list(slots)
    slots[i] = s._replace(**upd)
    return tuple(slots)


def material_slots(mat: M.Material) -> int:
    if isinstance(mat, (M.GlassMaterial, M.PlasticMaterial)):
        return 2
    return 1


def scene_slot_count(materials) -> int:
    return max((material_slots(m) for m in materials), default=1)


def compute_scattering(materials, hit: HitP, allow_multiple_lobes=False,
                       mode=lb.RADIANCE) -> S.LobesP:
    """materials.compute_scattering twin on planar state."""
    n_slots = scene_slot_count(materials)
    lo = S.from_hit(hit, n_slots)
    slots = lo.slots
    eta = lo.eta
    cache = [None]
    for mat_id, mat in enumerate(materials):
        mask = hit.valid & (hit.material_id == mat_id)
        if isinstance(mat, M.MatteMaterial):
            r = _clamp3(_tex_rgb(mat.Kd, hit, cache))
            sig = jnp.clip(_tex_scalar(mat.sigma, hit, cache), 0.0, 90.0)
            black = r.is_black()
            use_on = ~(jnp.abs(sig) < 1e-6)
            sig_rad = jnp.deg2rad(sig)
            s2 = sig_rad * sig_rad
            a = 1.0 - s2 / (2.0 * (s2 + 0.33))
            b = 0.45 * s2 / (s2 + 0.09)
            kind = jnp.where(use_on, lb.OREN_NAYAR, lb.LAMBERTIAN_REFLECTION)
            slots = _set_slot(
                slots, 0, mask & ~black, kind=kind, c0=r,
                a=jnp.where(use_on, a, 0.0), b=jnp.where(use_on, b, 0.0))
        elif isinstance(mat, M.MirrorMaterial):
            r = _clamp3(_tex_rgb(mat.Kr, hit, cache))
            slots = _set_slot(
                slots, 0, mask & ~r.is_black(),
                kind=jnp.int32(lb.SPECULAR_REFLECTION), c0=r,
                fr_kind=jnp.int32(fr.FRESNEL_NOOP))
        elif isinstance(mat, M.GlassMaterial):
            eta_m = _tex_scalar(mat.index, hit, cache)
            u_rough = _tex_scalar(mat.u_roughness, hit, cache)
            v_rough = _tex_scalar(mat.v_roughness, hit, cache)
            r = _clamp3(_tex_rgb(mat.Kr, hit, cache))
            t = _clamp3(_tex_rgb(mat.Kt, hit, cache))
            r_black, t_black = r.is_black(), t.is_black()
            all_black = r_black & t_black
            is_specular = (jnp.abs(u_rough) < 1e-6) & (jnp.abs(v_rough) < 1e-6)
            if mat.remap_roughness:
                u_rough = ggx.roughness_to_alpha(u_rough)
                v_rough = ggx.roughness_to_alpha(v_rough)
            eta = jnp.where(mask, eta_m, eta)
            ones = jnp.ones_like(eta_m)
            if allow_multiple_lobes:
                fs_mask = mask & ~all_black & is_specular
                slots = _set_slot(
                    slots, 0, fs_mask,
                    kind=jnp.int32(lb.FRESNEL_SPECULAR), c0=r, c1=t,
                    eta_a=ones, eta_b=eta_m,
                    fr_kind=jnp.int32(fr.FRESNEL_DIELECTRIC))
                sep_specular = jnp.zeros_like(is_specular)
            else:
                sep_specular = is_specular
            sep = mask & ~all_black & (~is_specular | sep_specular)
            kind_r = jnp.where(sep_specular, lb.SPECULAR_REFLECTION,
                               lb.MICROFACET_REFLECTION)
            slots = _set_slot(
                slots, 0, sep & ~r_black, kind=kind_r, c0=r,
                eta_a=ones, eta_b=eta_m, a=u_rough, b=v_rough,
                fr_kind=jnp.int32(fr.FRESNEL_DIELECTRIC))
            kind_t = jnp.where(sep_specular, lb.SPECULAR_TRANSMISSION,
                               lb.MICROFACET_TRANSMISSION)
            slots = _set_slot(
                slots, 1, sep & ~t_black, kind=kind_t, c0=t,
                eta_a=ones, eta_b=eta_m, a=u_rough, b=v_rough,
                fr_kind=jnp.int32(fr.FRESNEL_DIELECTRIC))
        elif isinstance(mat, M.PlasticMaterial):
            kd = _clamp3(_tex_rgb(mat.Kd, hit, cache))
            slots = _set_slot(
                slots, 0, mask & ~kd.is_black(),
                kind=jnp.int32(lb.LAMBERTIAN_REFLECTION), c0=kd)
            ks = _clamp3(_tex_rgb(mat.Ks, hit, cache))
            rough = _tex_scalar(mat.roughness, hit, cache)
            if mat.remap_roughness:
                rough = ggx.roughness_to_alpha(rough)
            slots = _set_slot(
                slots, 1, mask & ~ks.is_black(),
                kind=jnp.int32(lb.MICROFACET_REFLECTION), c0=ks,
                eta_a=jnp.full_like(rough, 1.5), eta_b=jnp.ones_like(rough),
                a=rough, b=rough,
                fr_kind=jnp.int32(fr.FRESNEL_DIELECTRIC))
        elif isinstance(mat, M.MetalMaterial):
            rough = _tex_scalar(mat.roughness, hit, cache)
            if mat.remap_roughness:
                rough = ggx.roughness_to_alpha(rough)
            slots = _set_slot(
                slots, 0, mask,
                kind=jnp.int32(lb.MICROFACET_REFLECTION),
                c0=V3.full(hit.t.shape, 1.0, 1.0, 1.0),
                a=rough, b=rough,
                fr_kind=jnp.int32(fr.FRESNEL_CONDUCTOR),
                fr_eta=_tex_rgb(mat.eta, hit, cache),
                fr_k=_tex_rgb(mat.k, hit, cache))
        else:
            raise NotImplementedError(
                f"planar path: unsupported material {type(mat).__name__}")
    return lo._replace(slots=slots, eta=eta)
