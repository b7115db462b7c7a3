"""Materials: texture evaluation -> BSDF lobe tables.

TPU-native counterpart of /root/reference/src/materials/material.jl. The
reference's material functors mutate ``si.bsdf``; here each material writes
its lobes into fixed slots of the batch ``Lobes`` SoA for the lanes it owns
(mask = hit.material_id == this material's id). Per-lane parameter branches
(sigma == 0, roughness == 0) become masked kind selection instead of Julia
``if``.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..bxdf import bsdf as B
from ..bxdf import lobes as lb
from ..bxdf import fresnel as fr
from ..bxdf import ggx
from ..core import spectrum as spec
from .textures import ConstantTexture, Texture, clamp_texture

F32 = jnp.float32


def _tex(value_or_texture) -> Texture:
    if isinstance(value_or_texture, Texture):
        return value_or_texture
    return ConstantTexture(value_or_texture)


class Material:
    """Base: ``add_lobes`` writes this material's lobes into the batch table
    for lanes where ``mask`` holds (the vectorized form of the reference's
    material functor call, primitive.jl:29-35)."""

    def add_lobes(self, lobes: B.Lobes, hit, mask, allow_multiple_lobes, mode):
        raise NotImplementedError


class MatteMaterial(Material):
    """Lambertian or Oren-Nayar by sigma (material.jl:16-31)."""

    def __init__(self, Kd=(0.5, 0.5, 0.5), sigma=0.0):
        self.Kd = _tex(Kd)
        self.sigma = _tex(sigma)

    def add_lobes(self, lobes, hit, mask, allow_multiple_lobes, mode):
        r = clamp_texture(self.Kd(hit))
        sig = jnp.clip(self.sigma(hit), 0.0, 90.0)
        black = spec.is_black(r)
        use_on = ~(jnp.abs(sig) < 1e-6)
        sig_rad = jnp.deg2rad(sig)
        s2 = sig_rad * sig_rad
        a = 1.0 - s2 / (2.0 * (s2 + 0.33))
        b = 0.45 * s2 / (s2 + 0.09)
        kind = jnp.where(use_on, lb.OREN_NAYAR, lb.LAMBERTIAN_REFLECTION)
        return B.set_lobe(
            lobes, 0, mask & ~black,
            kind=kind, c0=r,
            a=jnp.where(use_on, a, 0.0), b=jnp.where(use_on, b, 0.0),
        )


class MirrorMaterial(Material):
    """Perfect mirror (material.jl:39-46)."""

    def __init__(self, Kr=(0.9, 0.9, 0.9)):
        self.Kr = _tex(Kr)

    def add_lobes(self, lobes, hit, mask, allow_multiple_lobes, mode):
        r = clamp_texture(self.Kr(hit))
        black = spec.is_black(r)
        return B.set_lobe(
            lobes, 0, mask & ~black,
            kind=jnp.int32(lb.SPECULAR_REFLECTION), c0=r,
            fr_kind=jnp.int32(fr.FRESNEL_NOOP),
        )


class GlassMaterial(Material):
    """Smooth or rough dielectric (material.jl:75-116).

    Smooth + allow_multiple_lobes -> one FresnelSpecular lobe; otherwise a
    reflection lobe (slot 0) and a transmission lobe (slot 1), specular or
    GGX per-lane by roughness.
    """

    def __init__(
        self, Kr=(1.0, 1.0, 1.0), Kt=(1.0, 1.0, 1.0),
        u_roughness=0.0, v_roughness=0.0, index=1.5, remap_roughness=True,
    ):
        self.Kr, self.Kt = _tex(Kr), _tex(Kt)
        self.u_roughness, self.v_roughness = _tex(u_roughness), _tex(v_roughness)
        self.index = _tex(index)
        self.remap_roughness = bool(remap_roughness)

    def add_lobes(self, lobes, hit, mask, allow_multiple_lobes, mode):
        import dataclasses

        eta = self.index(hit)
        u_rough = self.u_roughness(hit)
        v_rough = self.v_roughness(hit)
        r = clamp_texture(self.Kr(hit))
        t = clamp_texture(self.Kt(hit))
        r_black = spec.is_black(r)
        t_black = spec.is_black(t)
        all_black = r_black & t_black

        is_specular = (jnp.abs(u_rough) < 1e-6) & (jnp.abs(v_rough) < 1e-6)
        if self.remap_roughness:
            u_rough = ggx.roughness_to_alpha(u_rough)
            v_rough = ggx.roughness_to_alpha(v_rough)

        lobes = dataclasses.replace(
            lobes, eta=jnp.where(mask, eta, lobes.eta)
        )

        if allow_multiple_lobes:
            fs_mask = mask & ~all_black & is_specular
            lobes = B.set_lobe(
                lobes, 0, fs_mask,
                kind=jnp.int32(lb.FRESNEL_SPECULAR), c0=r, c1=t,
                eta_a=jnp.ones_like(eta), eta_b=eta,
                fr_kind=jnp.int32(fr.FRESNEL_DIELECTRIC),
            )
            sep_specular = jnp.zeros_like(is_specular)
        else:
            sep_specular = is_specular

        sep = mask & ~all_black & (~is_specular | sep_specular)
        kind_r = jnp.where(
            sep_specular, lb.SPECULAR_REFLECTION, lb.MICROFACET_REFLECTION
        )
        lobes = B.set_lobe(
            lobes, 0, sep & ~r_black,
            kind=kind_r, c0=r,
            eta_a=jnp.ones_like(eta), eta_b=eta,
            a=u_rough, b=v_rough,
            fr_kind=jnp.int32(fr.FRESNEL_DIELECTRIC),
        )
        kind_t = jnp.where(
            sep_specular, lb.SPECULAR_TRANSMISSION, lb.MICROFACET_TRANSMISSION
        )
        lobes = B.set_lobe(
            lobes, 1, sep & ~t_black,
            kind=kind_t, c0=t,
            eta_a=jnp.ones_like(eta), eta_b=eta,
            a=u_rough, b=v_rough,
            fr_kind=jnp.int32(fr.FRESNEL_DIELECTRIC),
        )
        return lobes


class PlasticMaterial(Material):
    """Lambertian base + GGX coat (material.jl:135-151)."""

    def __init__(
        self, Kd=(0.25, 0.25, 0.25), Ks=(0.25, 0.25, 0.25),
        roughness=0.1, remap_roughness=True,
    ):
        self.Kd, self.Ks = _tex(Kd), _tex(Ks)
        self.roughness = _tex(roughness)
        self.remap_roughness = bool(remap_roughness)

    def add_lobes(self, lobes, hit, mask, allow_multiple_lobes, mode):
        kd = clamp_texture(self.Kd(hit))
        lobes = B.set_lobe(
            lobes, 0, mask & ~spec.is_black(kd),
            kind=jnp.int32(lb.LAMBERTIAN_REFLECTION), c0=kd,
        )
        ks = clamp_texture(self.Ks(hit))
        rough = self.roughness(hit)
        if self.remap_roughness:
            rough = ggx.roughness_to_alpha(rough)
        # FresnelDielectric(1.5, 1.0): the reference swaps "above"/"below"
        # for the coat (material.jl:147).
        return B.set_lobe(
            lobes, 1, mask & ~spec.is_black(ks),
            kind=jnp.int32(lb.MICROFACET_REFLECTION), c0=ks,
            eta_a=jnp.full_like(rough, 1.5), eta_b=jnp.ones_like(rough),
            a=rough, b=rough,
            fr_kind=jnp.int32(fr.FRESNEL_DIELECTRIC),
        )


class MetalMaterial(Material):
    """GGX conductor (capability beyond the reference's four materials;
    standard PBRT metal with per-channel eta/k)."""

    def __init__(self, eta=(0.2, 0.92, 1.1), k=(3.9, 2.45, 2.14), roughness=0.01,
                 remap_roughness=True):
        self.eta = _tex(eta)
        self.k = _tex(k)
        self.roughness = _tex(roughness)
        self.remap_roughness = bool(remap_roughness)

    def add_lobes(self, lobes, hit, mask, allow_multiple_lobes, mode):
        rough = self.roughness(hit)
        if self.remap_roughness:
            rough = ggx.roughness_to_alpha(rough)
        n = hit.t.shape[0]
        return B.set_lobe(
            lobes, 0, mask,
            kind=jnp.int32(lb.MICROFACET_REFLECTION),
            c0=jnp.ones((n, 3), F32),
            a=rough, b=rough,
            fr_kind=jnp.int32(fr.FRESNEL_CONDUCTOR),
            fr_eta=self.eta(hit), fr_k=self.k(hit),
        )


def compute_scattering(
    materials, hit, allow_multiple_lobes=False, mode=lb.RADIANCE
) -> B.Lobes:
    """Build the batch lobe table: every material fills its lanes
    (vectorized compute_scattering!, surface_interaction.jl:141-147 +
    primitive.jl:29-35). materials: list indexed by hit.material_id."""
    lobes = B.from_hit(hit)
    for mat_id, mat in enumerate(materials):
        mask = hit.valid & (hit.material_id == mat_id)
        lobes = mat.add_lobes(lobes, hit, mask, allow_multiple_lobes, mode)
    return lobes
