"""End-to-end Whitted wavefront integrator tests (the reference ships no
integrator tests — SURVEY.md §4 'Untested'; these are new coverage)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trace_tpu.core import transform as T
from trace_tpu.core.ray import RayDifferentials
from trace_tpu.lights import lights as L
from trace_tpu.materials.materials import MatteMaterial, MirrorMaterial
from trace_tpu.integrators.whitted import li, WhittedIntegrator
from trace_tpu.sampler.uniform import UniformSampler
from trace_tpu.scene import SceneBuilder
from trace_tpu.models.spheres import build_scene, build_camera

pytestmark = pytest.mark.slow  # compile-heavy: full-suite tier only


F32 = jnp.float32


def _head_on_rays(origins, directions):
    n = origins.shape[0]
    z3 = jnp.zeros((n, 3), F32)
    return RayDifferentials(
        o=origins, d=directions, t_max=jnp.full((n,), jnp.inf, F32),
        time=jnp.zeros((n,), F32), has_differentials=jnp.zeros((n,), bool),
        rx_origin=z3, ry_origin=z3, rx_direction=z3, ry_direction=z3,
    )


def test_li_direct_lighting_analytic():
    # Lambertian sphere, head-on light at the camera: L = f * I/r^2 * cos.
    b = SceneBuilder()
    mat = b.material(MatteMaterial(Kd=(0.8, 0.8, 0.8)))
    b.sphere(T.translate([0.0, 0.0, 0.0]), 1.0, mat)
    b.light(L.point_light(T.translate([0.0, 0.0, 5.0]), (100.0, 100.0, 100.0)))
    scene = b.build()

    rd = _head_on_rays(
        jnp.asarray([[0.0, 0.0, 5.0]]), jnp.asarray([[0.0, 0.0, -1.0]])
    )
    out = li(scene, rd, jax.random.key(0), max_depth=1)
    # Hit at (0,0,1): light distance 4, cos = 1.
    expected = (0.8 / np.pi) * (100.0 / 16.0)
    assert float(out[0, 0]) == pytest.approx(expected, rel=1e-3)


def test_li_shadowed_point_is_black():
    b = SceneBuilder()
    mat = b.material(MatteMaterial(Kd=(0.8, 0.8, 0.8)))
    b.sphere(T.translate([0.0, 0.0, 0.0]), 1.0, mat)
    b.sphere(T.translate([0.0, 0.0, 3.0]), 0.5, mat)  # blocks the light
    b.light(L.point_light(T.translate([0.0, 0.0, 5.0]), (100.0, 100.0, 100.0)))
    scene = b.build()
    # Ray that reaches the big sphere from the side, at a point whose
    # shadow ray to the light passes through the small sphere.
    rd = _head_on_rays(
        jnp.asarray([[5.0, 0.0, 0.9]]), jnp.asarray([[-1.0, 0.0, 0.0]])
    )
    out = li(scene, rd, jax.random.key(0), max_depth=1)
    assert float(jnp.max(jnp.abs(out))) == 0.0


def test_li_mirror_reflection_recurses():
    # Mirror floor reflecting a lit red back wall.
    b = SceneBuilder()
    matte = b.material(MatteMaterial(Kd=(0.9, 0.1, 0.1)))
    mirror = b.material(MirrorMaterial(Kr=(1.0, 1.0, 1.0)))
    floor = np.array([[-5, 0, -5], [5, 0, -5], [5, 0, 5], [-5, 0, 5]], np.float32)
    quad = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
    b.triangle_mesh(T.identity(), quad, floor, mirror)
    wall = np.array([[-5, 0, -2], [5, 0, -2], [5, 5, -2], [-5, 5, -2]], np.float32)
    b.triangle_mesh(T.identity(), quad, wall, matte)
    b.light(L.point_light(T.translate([0.0, 3.0, 2.0]), (200.0, 200.0, 200.0)))
    scene = b.build()

    # 45-degree ray onto the mirror floor at (0, 0, 1); the reflection
    # travels up/backward and lands on the wall at (0, 3, -2), which the
    # light hits head-on.
    o = jnp.asarray([[0.0, 1.0, 2.0]])
    d = jnp.asarray([[0.0, -1.0, -1.0]]) / np.sqrt(2)
    out_deep = li(scene, _head_on_rays(o, d), jax.random.key(0), max_depth=3)
    out_shallow = li(scene, _head_on_rays(o, d), jax.random.key(0), max_depth=1)
    # Depth-1 sees only the mirror floor (f = 0 for delta lobes) -> red
    # gain appears only via the reflected wall.
    assert float(out_deep[0, 0]) > float(out_shallow[0, 0]) + 1e-4


def test_render_shadows_scene_small():
    scene = build_scene()
    cam = build_camera(resolution=32, filename="/tmp/_shadows32.png")
    integ = WhittedIntegrator(cam, UniformSampler(1, seed=7), max_depth=3)
    state = integ.render(scene)
    img = np.asarray(cam.film.to_image(state))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.05  # something is lit
    # Determinism: same seed -> identical image.
    state2 = WhittedIntegrator(
        cam, UniformSampler(1, seed=7), max_depth=3
    ).render(scene)
    np.testing.assert_array_equal(img, np.asarray(cam.film.to_image(state2)))


def test_render_with_crop_window():
    # Film crop windows (reference film.jl:34-61): render only a sub-crop.
    from trace_tpu.film.film import Film
    from trace_tpu.film.filters import LanczosSincFilter
    from trace_tpu.camera.perspective import PerspectiveCamera
    from trace_tpu.core import transform as T

    film = Film((32, 32), crop=((0.25, 0.25), (0.75, 0.75)),
                filter=LanczosSincFilter((1.0, 1.0), 3.0),
                filename="/tmp/_crop.png")
    assert film.width == 16 and film.height == 16
    cam = PerspectiveCamera(
        T.look_at([0.0, 15.0, 50.0], [0.0, 0.0, -2.0], [0.0, 1.0, 0.0]),
        film=film,
    )
    scene = build_scene()
    state = WhittedIntegrator(cam, UniformSampler(1, seed=0), max_depth=2).render(scene)
    img = np.asarray(cam.film.to_image(state))
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()


def test_specular_queue_drops_counted_and_bounded():
    # A glass wall hit by every ray branches 2 children per lane each
    # level: at queue capacity N the overflow MUST be counted (no silent
    # energy loss, VERDICT r1 weak #3); a 4x capacity absorbs it.
    from trace_tpu.materials.materials import GlassMaterial

    b = SceneBuilder()
    glass = b.material(GlassMaterial(index=1.5))
    b.sphere(T.translate([0.0, 0.0, 0.0]), 1.0, glass)
    b.light(L.point_light(T.translate([0.0, 0.0, 5.0]), (10.0, 10.0, 10.0)))
    scene = b.build()

    n = 4
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 5.0]], F32), (n, 1))
    o = o + jnp.linspace(-0.1, 0.1, n)[:, None] * jnp.asarray([[1.0, 0, 0]], F32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], F32), (n, 1))
    rd = _head_on_rays(o, d)

    _, aux = li(scene, rd, jax.random.key(0), max_depth=3, return_aux=True)
    assert int(aux["queue_drops"]) > 0  # capacity N overflows

    l_wide, aux_wide = li(scene, rd, jax.random.key(0), max_depth=3,
                          queue_capacity=8 * n, return_aux=True)
    assert int(aux_wide["queue_drops"]) == 0
    assert np.isfinite(np.asarray(l_wide)).all()


def test_shipped_shadows_scene_has_zero_queue_drops():
    # The shipped scenes must render energy-exact at default capacity.
    scene = build_scene()
    cam = build_camera(resolution=32, filename="/tmp/_drops32.png")
    integ = WhittedIntegrator(cam, UniformSampler(1, seed=0), max_depth=5)
    integ.render(scene)
    assert int(integ.last_queue_drops) == 0


def test_sppm_requires_lights():
    from trace_tpu.scene import SceneBuilder
    from trace_tpu.core import transform as T
    from trace_tpu.materials.materials import MatteMaterial
    from trace_tpu.integrators.sppm import SPPMIntegrator

    b = SceneBuilder()
    mat = b.material(MatteMaterial())
    b.sphere(T.identity(), 1.0, mat)
    scene = b.build()
    cam = build_camera(resolution=8, filename="/tmp/_nl.png")
    with pytest.raises(ValueError, match="light"):
        SPPMIntegrator(cam, n_iterations=1).render(scene)


@pytest.mark.parametrize("entering", [True, False])
def test_transmit_differentials_match_finite_difference(entering):
    """rx/ry_direction must approximate the refracted direction of the
    one-pixel-offset rays (PBRT-errata SpecularTransmit). Flat interface,
    constant normals -> the differential is exactly the refract() of the
    offset ray to first order. Guards the eta-inversion/sign fix (the
    reference's exit branch is dead code: sampler.jl:181 tests
    (ns . ns) < 0, never true)."""
    import dataclasses

    from trace_tpu.core import math as m
    from trace_tpu.core.interaction import empty_hit
    from trace_tpu.integrators import common

    eta_int = 1.5
    eps = 1e-3
    sz = -1.0 if entering else 1.0
    d = np.array([0.3, -0.2, sz], np.float32)
    d /= np.linalg.norm(d)
    dx = d + np.array([eps, 0.0, 0.0], np.float32)
    dy = d + np.array([0.0, eps, 0.0], np.float32)
    dx /= np.linalg.norm(dx)
    dy /= np.linalg.norm(dy)
    ns = np.array([0.0, 0.0, 1.0], np.float32)
    ns_f = ns if entering else -ns        # face-forward toward wo
    eta_rel = 1.0 / eta_int if entering else eta_int

    def refracted(dd):
        ok, wt = m.refract(jnp.asarray(-dd)[None], jnp.asarray(ns_f)[None],
                           jnp.asarray([eta_rel], jnp.float32))
        assert bool(ok[0])
        return np.asarray(wt[0])

    wi = refracted(d)
    z3 = jnp.zeros((1, 3), jnp.float32)
    hit = dataclasses.replace(
        empty_hit((1,)),
        valid=jnp.ones(1, bool),
        p=z3,
        wo=jnp.asarray(-d)[None],
        n=jnp.asarray(ns)[None],
        ns=jnp.asarray(ns)[None],
    )
    rd = RayDifferentials(
        o=z3, d=jnp.asarray(d)[None], t_max=jnp.ones(1), time=jnp.zeros(1),
        has_differentials=jnp.ones(1, bool),
        rx_origin=z3, ry_origin=z3,
        rx_direction=jnp.asarray(dx)[None],
        ry_direction=jnp.asarray(dy)[None],
    )

    class _L:
        eta = jnp.asarray([eta_int], jnp.float32)

    _, _, rx_d, ry_d = common.transmit_differentials(
        rd, hit, _L(), jnp.asarray(wi)[None]
    )
    rx_d, ry_d = np.asarray(rx_d[0]), np.asarray(ry_d[0])
    # First-order approximation of the offset refraction directions.
    np.testing.assert_allclose(rx_d, refracted(dx), atol=5e-4)
    np.testing.assert_allclose(ry_d, refracted(dy), atol=5e-4)
    # And the differential is genuinely different from wi (non-degenerate).
    assert np.linalg.norm(rx_d - wi) > 1e-4
