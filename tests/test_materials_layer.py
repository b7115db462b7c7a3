"""Material -> lobe-table tests (counterpart of the reference's
test_materials.jl material section, plus the per-lane branching the
reference does with Julia `if`)."""
import numpy as np
import jax.numpy as jnp
import pytest

from trace_tpu.bxdf import bsdf as B
from trace_tpu.bxdf import lobes as lb
from trace_tpu.bxdf import fresnel as fr
from trace_tpu.core.interaction import empty_hit
from trace_tpu.materials.materials import (
    GlassMaterial, MatteMaterial, MetalMaterial, MirrorMaterial,
    PlasticMaterial, compute_scattering,
)
from trace_tpu.utils.pytree import replace


def _hits(n=4):
    h = empty_hit((n,))
    return replace(
        h,
        valid=jnp.ones((n,), bool),
        ns=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3)),
        n=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3)),
        s_dpdu=jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3)),
        material_id=jnp.zeros((n,), jnp.int32),
    )


def test_matte_sigma_zero_is_lambertian():
    lobes = compute_scattering([MatteMaterial(Kd=(0.5, 0.5, 0.5), sigma=0.0)],
                               _hits())
    assert np.all(np.asarray(lobes.kind[:, 0]) == lb.LAMBERTIAN_REFLECTION)
    assert np.all(np.asarray(lobes.kind[:, 1:]) == lb.NONE)


def test_matte_sigma_positive_is_oren_nayar():
    lobes = compute_scattering([MatteMaterial(Kd=(0.5, 0.5, 0.5), sigma=20.0)],
                               _hits())
    assert np.all(np.asarray(lobes.kind[:, 0]) == lb.OREN_NAYAR)
    s = np.deg2rad(20.0) ** 2
    np.testing.assert_allclose(
        np.asarray(lobes.a[:, 0]), 1 - s / (2 * (s + 0.33)), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(lobes.b[:, 0]), 0.45 * s / (s + 0.09), rtol=1e-5
    )


def test_glass_smooth_multiple_lobes_is_fresnel_specular():
    lobes = compute_scattering([GlassMaterial(index=1.5)], _hits(),
                               allow_multiple_lobes=True)
    assert np.all(np.asarray(lobes.kind[:, 0]) == lb.FRESNEL_SPECULAR)
    np.testing.assert_allclose(np.asarray(lobes.eta), 1.5)
    assert np.all(np.asarray(lobes.kind[:, 1]) == lb.NONE)


def test_glass_smooth_single_lobe_mode_splits():
    lobes = compute_scattering([GlassMaterial(index=1.5)], _hits(),
                               allow_multiple_lobes=False)
    assert np.all(np.asarray(lobes.kind[:, 0]) == lb.SPECULAR_REFLECTION)
    assert np.all(np.asarray(lobes.kind[:, 1]) == lb.SPECULAR_TRANSMISSION)


def test_glass_rough_uses_microfacets():
    lobes = compute_scattering(
        [GlassMaterial(index=1.5, u_roughness=0.2, v_roughness=0.2,
                       remap_roughness=False)],
        _hits(), allow_multiple_lobes=True,
    )
    assert np.all(np.asarray(lobes.kind[:, 0]) == lb.MICROFACET_REFLECTION)
    assert np.all(np.asarray(lobes.kind[:, 1]) == lb.MICROFACET_TRANSMISSION)
    np.testing.assert_allclose(np.asarray(lobes.a[:, 0]), 0.2)


def test_plastic_two_lobes():
    lobes = compute_scattering(
        [PlasticMaterial(Kd=(0.6,) * 3, Ks=(0.1,) * 3, roughness=0.05)],
        _hits(),
    )
    assert np.all(np.asarray(lobes.kind[:, 0]) == lb.LAMBERTIAN_REFLECTION)
    assert np.all(np.asarray(lobes.kind[:, 1]) == lb.MICROFACET_REFLECTION)
    # Coat fresnel is the reference's swapped (1.5, 1.0) dielectric.
    np.testing.assert_allclose(np.asarray(lobes.eta_a[:, 1]), 1.5)
    np.testing.assert_allclose(np.asarray(lobes.eta_b[:, 1]), 1.0)


def test_mirror_and_metal():
    lobes = compute_scattering([MirrorMaterial(Kr=(0.9,) * 3)], _hits())
    assert np.all(np.asarray(lobes.kind[:, 0]) == lb.SPECULAR_REFLECTION)
    assert np.all(np.asarray(lobes.fr_kind[:, 0]) == fr.FRESNEL_NOOP)

    lobes = compute_scattering([MetalMaterial(roughness=0.1)], _hits())
    assert np.all(np.asarray(lobes.kind[:, 0]) == lb.MICROFACET_REFLECTION)
    assert np.all(np.asarray(lobes.fr_kind[:, 0]) == fr.FRESNEL_CONDUCTOR)


def test_black_texture_yields_no_lobe():
    lobes = compute_scattering([MatteMaterial(Kd=(0.0, 0.0, 0.0))], _hits())
    assert np.all(np.asarray(lobes.kind) == lb.NONE)
    assert np.all(np.asarray(B.num_components(lobes)) == 0)


def test_material_masking_by_id():
    # Two materials; lanes route to their own material's lobes.
    h = _hits(4)
    h = replace(h, material_id=jnp.asarray([0, 1, 0, 1], jnp.int32))
    lobes = compute_scattering(
        [MatteMaterial(Kd=(0.5,) * 3), MirrorMaterial(Kr=(0.9,) * 3)], h
    )
    kinds = np.asarray(lobes.kind[:, 0])
    np.testing.assert_array_equal(
        kinds,
        [lb.LAMBERTIAN_REFLECTION, lb.SPECULAR_REFLECTION,
         lb.LAMBERTIAN_REFLECTION, lb.SPECULAR_REFLECTION],
    )


def test_scale_texture_scalar_value_spectral_scale():
    # Broadcasting must work in BOTH directions (a scalar value with a
    # spectral scale previously raised a shape error inside jit).
    from trace_tpu.materials.textures import ConstantTexture, ScaleTexture
    from trace_tpu.core.interaction import empty_hit

    hit = empty_hit((4,))
    t1 = ScaleTexture(ConstantTexture(0.5), ConstantTexture((1.0, 2.0, 3.0)))
    np.testing.assert_allclose(
        np.asarray(t1(hit)), np.tile([0.5, 1.0, 1.5], (4, 1))
    )
    t2 = ScaleTexture(ConstantTexture((1.0, 2.0, 3.0)), ConstantTexture(0.5))
    np.testing.assert_allclose(
        np.asarray(t2(hit)), np.tile([0.5, 1.0, 1.5], (4, 1))
    )
    t3 = ScaleTexture(ConstantTexture(0.5), ConstantTexture(2.0))
    np.testing.assert_allclose(np.asarray(t3(hit)), np.full(4, 1.0))
