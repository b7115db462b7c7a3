"""Path-tracer tests (capability beyond the reference)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trace_tpu.core import transform as T
from trace_tpu.core.ray import RayDifferentials
from trace_tpu.lights import lights as L
from trace_tpu.materials.materials import MatteMaterial
from trace_tpu.integrators import path as path_mod
from trace_tpu.integrators import whitted as whitted_mod
from trace_tpu.scene import SceneBuilder

F32 = jnp.float32


def _rays(origins, directions):
    n = origins.shape[0]
    z3 = jnp.zeros((n, 3), F32)
    return RayDifferentials(
        o=origins, d=directions, t_max=jnp.full((n,), jnp.inf, F32),
        time=jnp.zeros((n,), F32), has_differentials=jnp.zeros((n,), bool),
        rx_origin=z3, ry_origin=z3, rx_direction=z3, ry_direction=z3,
    )


def test_path_depth1_matches_whitted_for_delta_light():
    # Single Lambertian sphere + point light: at depth 1 both integrators
    # reduce to the same deterministic direct-lighting estimate.
    b = SceneBuilder()
    mat = b.material(MatteMaterial(Kd=(0.8, 0.8, 0.8)))
    b.sphere(T.translate([0.0, 0.0, 0.0]), 1.0, mat)
    b.light(L.point_light(T.translate([0.0, 0.0, 5.0]), (100.0, 100.0, 100.0)))
    scene = b.build()
    rd = _rays(jnp.asarray([[0.0, 0.0, 5.0]]), jnp.asarray([[0.0, 0.0, -1.0]]))
    l_path = path_mod.li(scene, rd, jax.random.key(0), max_depth=1)
    l_whit = whitted_mod.li(scene, rd, jax.random.key(0), max_depth=1)
    np.testing.assert_allclose(
        np.asarray(l_path), np.asarray(l_whit), rtol=1e-5
    )
    expected = (0.8 / np.pi) * (100.0 / 16.0)
    assert float(l_path[0, 0]) == pytest.approx(expected, rel=1e-3)


def _furnace_scene(albedo, emit):
    # Closed box, all walls the same albedo, ceiling panel light.
    b = SceneBuilder()
    white = b.material(MatteMaterial(Kd=(albedo,) * 3))
    quad = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)

    def q(verts, emission=None):
        b.triangle_mesh(T.identity(), quad, np.asarray(verts, np.float32),
                        white, emission=emission)

    q([[-1, -1, 1], [1, -1, 1], [1, -1, -1], [-1, -1, -1]])
    q([[-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1]])
    q([[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1]])
    q([[-1, -1, 1], [-1, -1, -1], [-1, 1, -1], [-1, 1, 1]])
    q([[1, -1, -1], [1, -1, 1], [1, 1, 1], [1, 1, -1]])
    q([[-1, 1, 0.999], [1, 1, 0.999], [1, -1, 0.999], [-1, -1, 0.999]])  # front
    q([[-0.5, 0.98, -0.5], [0.5, 0.98, -0.5], [0.5, 0.98, 0.5],
       [-0.5, 0.98, 0.5]], emission=(emit,) * 3)
    return b.build(use_bvh=False)


def test_path_more_bounces_more_energy():
    # In an enclosed box, deeper paths pick up more indirect light, and the
    # total must stay bounded (energy conservation, albedo < 1).
    scene = _furnace_scene(0.7, 5.0)
    n = 64
    key = jax.random.key(3)
    o = jnp.broadcast_to(jnp.asarray([0.0, -0.5, 0.0]), (n, 3))
    # random directions
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rd = _rays(o, d)
    l1 = np.asarray(path_mod.li(scene, rd, key, max_depth=1)).mean()
    l4 = np.asarray(path_mod.li(scene, rd, key, max_depth=4)).mean()
    l8 = np.asarray(path_mod.li(scene, rd, key, max_depth=8)).mean()
    assert l4 > l1
    assert l8 >= l4 * 0.95
    # Geometric-series bound: total <= direct/(1-albedo) * safety margin.
    assert l8 < l1 / (1 - 0.7) * 2.0


def test_cornell_render_smoke():
    from trace_tpu.models.cornell import build_scene, build_camera
    from trace_tpu.integrators.path import PathIntegrator
    from trace_tpu.sampler.uniform import UniformSampler

    scene = build_scene()
    cam = build_camera(resolution=24, filename="/tmp/_cornell24.png")
    state = PathIntegrator(cam, UniformSampler(2, seed=1), max_depth=4).render(scene)
    img = np.asarray(cam.film.to_image(state))
    assert np.isfinite(img).all()
    assert img.max() > 0.05
    # Wall colors via direct radiance probes (the telephoto camera sees
    # the side walls nearly edge-on, so image-space crops are unreliable).
    probes = _rays(
        jnp.zeros((2, 3), F32),
        jnp.asarray([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]]),
    )
    l = np.asarray(path_mod.li(scene, probes, jax.random.key(0), max_depth=2))
    assert l[0, 1] > l[0, 0]  # +x: green wall
    assert l[1, 0] > l[1, 1]  # -x: red wall
