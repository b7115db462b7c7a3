"""Light-table and scene-intersection tests (no reference counterpart for
lights — the reference leaves them untested, SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trace_tpu.core import transform as T
from trace_tpu.lights import lights as L
from trace_tpu.materials.materials import MatteMaterial
from trace_tpu.scene import SceneBuilder


def test_point_light_sample_li():
    lights = L.pack_lights([L.point_light(T.translate([0.0, 2.0, 0.0]), (25.0, 25.0, 25.0))])
    p_ref = jnp.asarray([[0.0, 0.0, 0.0]])
    idx = jnp.zeros(1, jnp.int32)
    rad, wi, pdf, p_l = L.sample_li(lights, idx, p_ref, jnp.zeros((1, 2)))
    np.testing.assert_allclose(np.asarray(wi)[0], [0, 1, 0], atol=1e-6)
    assert float(pdf[0]) == 1.0
    np.testing.assert_allclose(np.asarray(rad)[0], 25.0 / 4.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_l)[0], [0, 2, 0], atol=1e-6)


def test_point_light_power_and_le():
    lights = L.pack_lights([L.point_light(T.identity(), (2.0, 2.0, 2.0))])
    np.testing.assert_allclose(np.asarray(L.power(lights))[0], 8 * np.pi, rtol=1e-5)
    le, o, d, n_l, pdf_pos, pdf_dir = L.sample_le(
        lights, jnp.zeros(4, jnp.int32),
        jax.random.uniform(jax.random.key(0), (4, 2)),
        jax.random.uniform(jax.random.key(1), (4, 2)),
        jnp.zeros(4),
    )
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(d, axis=-1)), 1.0, atol=1e-5)
    assert np.all(np.asarray(pdf_pos) == 1.0)
    np.testing.assert_allclose(np.asarray(pdf_dir), 1 / (4 * np.pi), rtol=1e-5)


def test_spot_light_falloff():
    # Spot at origin pointing +z (identity light_to_world), 30deg cone,
    # 20deg falloff start.
    lights = L.pack_lights([L.spot_light(T.identity(), (10.0, 10.0, 10.0), 30.0, 20.0)])
    idx = jnp.zeros(3, jnp.int32)
    # Points: on-axis (full), outside cone (zero), in falloff band.
    p_ref = jnp.asarray([
        [0.0, 0.0, 5.0],      # on-axis
        [5.0, 0.0, 1.0],      # far off-axis
        [np.tan(np.deg2rad(25.0)) * 5, 0.0, 5.0],
    ])
    rad, wi, pdf, _ = L.sample_li(lights, idx, p_ref, jnp.zeros((3, 2)))
    r = np.asarray(rad)[:, 0]
    assert r[0] == pytest.approx(10.0 / 25.0, rel=1e-4)
    assert r[1] == 0.0
    assert 0 < r[2] < 10.0 / (p_ref[2, 0] ** 2 + 25.0)


def test_distant_light():
    lights = L.pack_lights([L.distant_light(T.identity(), (3.0, 3.0, 3.0), (0.0, 1.0, 0.0))])
    lights = L.preprocess(lights, np.zeros(3), 10.0)
    rad, wi, pdf, p_l = L.sample_li(
        lights, jnp.zeros(1, jnp.int32), jnp.asarray([[1.0, 0.0, 0.0]]), jnp.zeros((1, 2))
    )
    np.testing.assert_allclose(np.asarray(wi)[0], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rad)[0], 3.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p_l)[0], [1, 20, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(L.power(lights))[0], 3 * np.pi * 100, rtol=1e-5)


def test_blackbody_normalized_peak_is_one():
    t = 5500.0
    lam_max = 2.8977721e-3 / t * 1e9
    le = L.blackbody_normalized(jnp.asarray([lam_max]), t)
    assert float(le[0]) == pytest.approx(1.0, rel=1e-4)


# ---------------------------------------------------------------------------
# Scene
# ---------------------------------------------------------------------------


def _two_sphere_scene():
    b = SceneBuilder()
    mat = b.material(MatteMaterial(Kd=(0.5, 0.5, 0.5)))
    b.sphere(T.translate([0.0, 0.0, 0.0]), 1.0, mat)
    b.sphere(T.translate([0.0, 0.0, -5.0]), 1.0, mat)
    b.light(L.point_light(T.translate([0.0, 3.0, 0.0]), (10.0, 10.0, 10.0)))
    return b.build()


def test_scene_closest_hit_picks_nearer_sphere():
    scene = _two_sphere_scene()
    o = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
    t_max = jnp.full(2, jnp.inf)
    hit = scene.intersect(o, d, t_max)
    assert bool(hit.valid[0]) and not bool(hit.valid[1])
    assert float(hit.t[0]) == pytest.approx(4.0, rel=1e-4)
    assert int(hit.prim_id[0]) == 0
    np.testing.assert_allclose(np.asarray(hit.n)[0], [0, 0, 1], atol=1e-4)


def test_scene_occlusion():
    scene = _two_sphere_scene()
    # Ray from front sphere surface toward a point behind the rear sphere.
    p0 = jnp.asarray([[0.0, 0.0, 1.001]])
    p1 = jnp.asarray([[0.0, 0.0, -8.0]])
    assert not bool(scene.unoccluded(p0, p1)[0])
    p1_clear = jnp.asarray([[0.0, 5.0, 2.0]])
    assert bool(scene.unoccluded(p0, p1_clear)[0])


def test_scene_mixed_sphere_triangle():
    b = SceneBuilder()
    mat = b.material(MatteMaterial())
    b.sphere(T.translate([0.0, 0.0, -3.0]), 1.0, mat)
    # Triangle in front of the sphere.
    verts = np.array([[-1, -1, -1.5], [1, -1, -1.5], [0, 1, -1.5]], np.float32)
    b.triangle_mesh(T.identity(), np.array([[0, 1, 2]], np.uint32), verts, mat)
    b.light(L.point_light(T.identity(), (1.0, 1.0, 1.0)))
    scene = b.build()
    o = jnp.asarray([[0.0, 0.0, 2.0], [0.0, -2.0, 2.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    hit = scene.intersect(o, d, jnp.full(2, jnp.inf))
    # Lane 0 hits the triangle first (t=3.5), lane 1 misses both.
    assert bool(hit.valid[0])
    assert float(hit.t[0]) == pytest.approx(3.5, rel=1e-4)
    assert int(hit.prim_id[0]) == 1  # triangle ids start after 1 sphere
    assert not bool(hit.valid[1])


def test_transmittance_matches_occlusion():
    """Scene.transmittance is the reference VisibilityTester.trace
    (light.jl:21-35) collapsed to 0/1 — every primitive has a material."""
    import jax.numpy as jnp
    import numpy as np
    from trace_tpu.models.spheres import build_scene

    scene = build_scene()
    p0 = jnp.asarray([[0.3, 2.0, -2.2], [0.3, 2.0, -2.2]], jnp.float32)
    # First target: straight down through the sphere at (0.3, 0.11, -2.2)
    # (occluded); second: a point right next to p0 (clear).
    p1 = jnp.asarray([[0.3, -1.0, -2.2], [0.3, 1.9, -2.2]], jnp.float32)
    tr = np.asarray(scene.transmittance(p0, p1))
    vis = np.asarray(scene.unoccluded(p0, p1))
    assert tr.shape == (2, 3)
    np.testing.assert_array_equal(tr[:, 0] > 0, vis)
    assert tr[0].max() == 0.0 and tr[1].min() == 1.0


def test_distant_light_sample_le_direction():
    # Photons from a distant light must start on the LIGHT side of the
    # scene sphere and travel along -direction (direction points toward
    # the light, per sample_li): PBRT Ray(pDisk + wr*wLight, -wLight).
    lights = L.pack_lights(
        [L.distant_light(T.identity(), (3.0, 3.0, 3.0), (0.0, 1.0, 0.0))]
    )
    wc, wr = np.zeros(3), 10.0
    lights = L.preprocess(lights, wc, wr)
    n = 64
    le, o, d, n_l, pdf_pos, pdf_dir = L.sample_le(
        lights, jnp.zeros(n, jnp.int32),
        jax.random.uniform(jax.random.key(0), (n, 2)),
        jax.random.uniform(jax.random.key(1), (n, 2)),
        jnp.zeros(n),
    )
    d, o = np.asarray(d), np.asarray(o)
    np.testing.assert_allclose(d, np.tile([0.0, -1.0, 0.0], (n, 1)), atol=1e-6)
    # Origins on the +direction (light) side of the scene center.
    assert np.all((o - wc) @ np.asarray([0.0, 1.0, 0.0]) > 0)
    # Photon beams must cross the bounding sphere's equatorial disk.
    np.testing.assert_allclose(np.asarray(pdf_pos), 1 / (np.pi * wr**2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(pdf_dir), 1.0)


def _area_light_scene(two_sided):
    b = SceneBuilder()
    from trace_tpu.materials.textures import ConstantTexture
    mid = b.material(MatteMaterial(ConstantTexture([0.5, 0.5, 0.5]),
                                   ConstantTexture(0.0)))
    tris = np.array([[0, 1, 2]], np.int64)
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    b.triangle_mesh(T.identity(), tris, verts, material=mid,
                    emission=(5.0, 5.0, 5.0), two_sided=two_sided)
    return b.build()


@pytest.mark.parametrize("two_sided", [False, True])
def test_area_light_sample_le_sides(two_sided):
    s = _area_light_scene(two_sided)
    n = 512
    le, o, d, n_l, pdf_pos, pdf_dir = L.sample_le(
        s.lights, jnp.zeros(n, jnp.int32),
        jax.random.uniform(jax.random.key(2), (n, 2)),
        jax.random.uniform(jax.random.key(3), (n, 2)),
        jnp.zeros(n),
        tris=s.triangles, max_area_tris=s.max_area_tris,
    )
    cos = np.sum(np.asarray(d) * np.asarray(n_l), axis=-1)
    if two_sided:
        # Both hemispheres populated, pdf halved: pdf = |cos|/(2pi).
        assert (cos > 1e-4).sum() > n // 4 and (cos < -1e-4).sum() > n // 4
        np.testing.assert_allclose(
            np.asarray(pdf_dir), np.abs(cos) / (2 * np.pi), atol=1e-5
        )
    else:
        assert np.all(cos > -1e-6)
        np.testing.assert_allclose(
            np.asarray(pdf_dir), np.abs(cos) / np.pi, atol=1e-5
        )
