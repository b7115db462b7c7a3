"""Planar wavefront path (trace_tpu/wavefront) vs the packed oracle path.

Every planar module is a formula-for-formula twin of its packed
counterpart; these tests pin them together (bit-exact where the op
order is identical, tight allclose where association differs).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trace_tpu.core.vec import V3
from trace_tpu.core.ray import RayDifferentials
from trace_tpu.wavefront import geom as G
from trace_tpu.shapes import sphere as sph_mod
from trace_tpu.shapes import triangle as tri_mod
from trace_tpu.core.interaction import compute_differentials as cd_packed
from trace_tpu.models.spheres import build_scene


def _rays(n, seed=0, aim=(0.3, 0.0, -2.5), spread=1.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-1, 1, (n, 3)).astype(np.float32) * [1, 0.5, 1]
    o[:, 2] += 2.0
    target = np.asarray(aim, np.float32) + spread * rng.uniform(
        -0.5, 0.5, (n, 3)
    ).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.fixture(scope="module")
def scene():
    return build_scene()


def test_spheres_closest_matches_packed(scene):
    o, d = _rays(512)
    t_max = jnp.full((512,), jnp.inf, jnp.float32)
    hp, tp, ip = sph_mod.intersect_closest(scene.spheres, o, d, t_max)
    hv, tv, iv = G.spheres_closest(scene.spheres_host, V3.of(o), V3.of(d),
                                   t_max)
    np.testing.assert_array_equal(np.asarray(hp), np.asarray(hv))
    np.testing.assert_allclose(
        np.asarray(jnp.where(hp, tp, 0.0)),
        np.asarray(jnp.where(hv, tv, 0.0)), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(
        np.asarray(jnp.where(hp, ip, -1)), np.asarray(jnp.where(hv, iv, -1)))


def test_triangles_closest_matches_packed(scene):
    o, d = _rays(512, seed=1, aim=(0.5, 0.2, -2.5), spread=2.0)
    t_max = jnp.full((512,), jnp.inf, jnp.float32)
    hp, tp, ip = tri_mod.intersect_closest(scene.triangles, o, d, t_max)
    hv, tv, iv = G.triangles_closest(scene.triangles_host, V3.of(o),
                                     V3.of(d), t_max)
    np.testing.assert_array_equal(np.asarray(hp), np.asarray(hv))
    np.testing.assert_allclose(
        np.asarray(jnp.where(hp, tp, 0.0)),
        np.asarray(jnp.where(hv, tv, 0.0)), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(
        np.asarray(jnp.where(hp, ip, -1)), np.asarray(jnp.where(hv, iv, -1)))


def _cmp_hit(packed, planar, mask, rtol=2e-6, atol=2e-6):
    pk = G.hitp_to_packed(planar)
    m = np.asarray(mask)
    for field in ("t", "p", "wo", "n", "uv", "dpdu", "dpdv", "ns",
                  "s_dpdu", "s_dpdv", "s_dndu", "s_dndv"):
        a = np.asarray(getattr(packed, field))[m]
        b = np.asarray(getattr(pk, field))[m]
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol,
                                   err_msg=f"field {field}")
    for field in ("prim_id", "material_id"):
        np.testing.assert_array_equal(
            np.asarray(getattr(packed, field))[m],
            np.asarray(getattr(pk, field))[m], err_msg=f"field {field}")


def test_sphere_detail_matches_packed(scene):
    n = 512
    o, d = _rays(n)
    t_max = jnp.full((n,), jnp.inf, jnp.float32)
    time = jnp.zeros((n,), jnp.float32)
    hp, tp, ip = sph_mod.intersect_closest(scene.spheres, o, d, t_max)
    packed = sph_mod.make_hit(scene.spheres, o, d, time, tp, ip, hp)
    rows = G.sphere_rows(scene.spheres_host)
    planar = G.make_hit_spheres(rows, V3.of(o), V3.of(d), time, tp, ip, hp)
    assert np.asarray(hp).sum() > 50
    _cmp_hit(packed, planar, hp)


def test_triangle_detail_matches_packed(scene):
    n = 512
    o, d = _rays(n, seed=2, aim=(0.5, 0.2, -2.6), spread=2.0)
    time = jnp.zeros((n,), jnp.float32)
    t_max = jnp.full((n,), jnp.inf, jnp.float32)
    hp, tp, ip = tri_mod.intersect_closest(scene.triangles, o, d, t_max)
    packed = tri_mod.make_hit(scene.triangles, o, d, time, ip, hp)
    rows = G.triangle_rows(scene.triangles_host)
    planar = G.make_hit_triangles(rows, V3.of(o), V3.of(d), time, ip, hp)
    assert np.asarray(hp).sum() > 50
    np.testing.assert_array_equal(np.asarray(packed.valid),
                                  np.asarray(planar.valid))
    _cmp_hit(packed, planar, np.asarray(packed.valid))


def test_differentials_match_packed(scene):
    n = 256
    o, d = _rays(n)
    time = jnp.zeros((n,), jnp.float32)
    t_max = jnp.full((n,), jnp.inf, jnp.float32)
    eps = 1e-3
    rd = RayDifferentials(
        o=o, d=d, t_max=t_max, time=time,
        has_differentials=jnp.ones((n,), bool),
        rx_origin=o + jnp.asarray([eps, 0, 0], jnp.float32),
        ry_origin=o + jnp.asarray([0, eps, 0], jnp.float32),
        rx_direction=d, ry_direction=d,
    )
    hp, tp, ip = sph_mod.intersect_closest(scene.spheres, o, d, t_max)
    packed = sph_mod.make_hit(scene.spheres, o, d, time, tp, ip, hp)
    packed = cd_packed(packed, rd)
    rows = G.sphere_rows(scene.spheres_host)
    planar = G.make_hit_spheres(rows, V3.of(o), V3.of(d), time, tp, ip, hp)
    planar = G.compute_differentials(planar, G.RayP.of(rd))
    pk = G.hitp_to_packed(planar)
    m = np.asarray(hp)
    for field in ("dudx", "dudy", "dvdx", "dvdy", "dpdx", "dpdy"):
        np.testing.assert_allclose(
            np.asarray(getattr(packed, field))[m],
            np.asarray(getattr(pk, field))[m],
            rtol=2e-5, atol=2e-5, err_msg=f"field {field}")


def _camera_rays(n, seed=5):
    o, d = _rays(n, seed=seed, aim=(0.4, 0.2, -2.5), spread=1.5)
    eps = 1e-3
    return RayDifferentials(
        o=o, d=d, t_max=jnp.full((n,), jnp.inf, jnp.float32),
        time=jnp.zeros((n,), jnp.float32),
        has_differentials=jnp.ones((n,), bool),
        rx_origin=o + jnp.asarray([eps, 0, 0], jnp.float32),
        ry_origin=o + jnp.asarray([0, eps, 0], jnp.float32),
        rx_direction=d, ry_direction=d,
    )


@pytest.mark.slow
def test_li_planar_matches_packed(scene):
    from trace_tpu.integrators import whitted as packed_w
    from trace_tpu.wavefront import whitted as planar_w

    n = 1024
    rd = _camera_rays(n)
    key = jax.random.key(7)
    lp, aux_p = packed_w.li(scene, rd, key, max_depth=5, return_aux=True)
    lv, aux_v = planar_w.li(scene, rd, key, max_depth=5, return_aux=True)
    a, b = np.asarray(lp), np.asarray(lv)
    assert a.sum() > 0  # scene actually lights up
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    assert int(aux_p["useful_rays"]) == int(aux_v["useful_rays"])
    assert int(aux_p["queue_drops"]) == int(aux_v["queue_drops"])


@pytest.mark.slow
def test_li_planar_level_caps_exact_when_roomy(scene):
    """A shrunken-but-sufficient capacity schedule must be drop-free and
    match the full-width planar run (same math; the unrolled depth loop
    compiles with different fusion/association than the fori_loop body,
    so equality is tight-allclose, not bit-exact)."""
    from trace_tpu.wavefront import whitted as planar_w

    n = 512
    rd = _camera_rays(n, seed=9)
    key = jax.random.key(3)
    l_full, aux_full = planar_w.li(scene, rd, key, max_depth=5,
                                   return_aux=True)
    l_caps, aux_caps = planar_w.li(
        scene, rd, key, max_depth=5, return_aux=True,
        level_caps=(n, n, n, n))
    assert int(aux_caps["queue_drops"]) == 0
    assert (int(aux_caps["useful_rays"])
            == int(aux_full["useful_rays"]))
    np.testing.assert_allclose(np.asarray(l_full), np.asarray(l_caps),
                               rtol=2e-3, atol=1e-4)


@pytest.mark.slow
def test_path_planar_matches_packed():
    from trace_tpu.models.cornell import build_scene
    from trace_tpu.integrators import path as packed_p
    from trace_tpu.wavefront import path as planar_p

    sc = build_scene()
    assert planar_p.supports(sc)
    n = 1024
    rng = np.random.default_rng(11)
    # Rays from the front of the box toward the interior.
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = rng.uniform(-0.8, 0.8, n)
    o[:, 1] = rng.uniform(0.2, 1.8, n)
    o[:, 2] = 3.0
    tgt = np.stack([rng.uniform(-0.9, 0.9, n), rng.uniform(0.1, 1.9, n),
                    rng.uniform(-1.8, -0.2, n)], -1).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    rd = RayDifferentials(
        o=o, d=d, t_max=jnp.full((n,), jnp.inf, jnp.float32),
        time=jnp.zeros((n,), jnp.float32),
        has_differentials=jnp.zeros((n,), bool),
        rx_origin=o, ry_origin=o, rx_direction=d, ry_direction=d,
    )
    key = jax.random.key(13)
    lp, aux_p = packed_p.li(sc, rd, key, max_depth=5, return_aux=True)
    lv, aux_v = planar_p.li(sc, rd, key, max_depth=5, return_aux=True)
    a, b = np.asarray(lp), np.asarray(lv)
    assert a.sum() > 0
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)
    # Path-tracer liveness depends on continuous thresholds (bs.pdf > 0
    # under Russian roulette), so f32 association differences can flip a
    # handful of boundary lanes; counts must agree to 0.5%, not exactly.
    up, uv = int(aux_p["useful_rays"]), int(aux_v["useful_rays"])
    assert abs(up - uv) <= max(50, 0.005 * up), (up, uv)


@pytest.mark.slow
def test_sppm_camera_planar_matches_packed(scene):
    from trace_tpu.integrators.sppm import SPPMIntegrator
    from trace_tpu.wavefront import sppm_camera as planar_c
    from trace_tpu.models.spheres import build_camera

    camera = build_camera(resolution=32, filename="/tmp/eqv_sppm.png")
    integ = SPPMIntegrator(camera, initial_search_radius=0.1, max_depth=5,
                           n_iterations=4)
    assert planar_c.supports(scene)
    pixels = jnp.asarray(integ._pixel_grid()[: 32 * 32])
    valid = jnp.ones((pixels.shape[0],), bool)
    key = jax.random.key(21)
    ld_p, vp_p = integ._camera_pass_body_packed(scene, pixels, valid, key)
    ld_v, vp_v = planar_c.camera_pass_body(integ, scene, pixels, valid, key)
    # Discrete branches on continuous values (RR luminance < 0.25,
    # u_rr > cp, make_vp lobe counts) can flip on lanes where the two
    # implementations' f32 association differs by ulps — compare on the
    # >= 99.5% of lanes that agree, and require the flip fraction small.
    a, b = np.asarray(ld_p), np.asarray(ld_v)
    agree_ld = np.all(np.abs(a - b) <= 3e-5 + 3e-4 * np.abs(a), axis=-1)
    assert agree_ld.mean() > 0.995, agree_ld.mean()
    same_valid = np.asarray(vp_p.valid) == np.asarray(vp_v.valid)
    assert same_valid.mean() > 0.995, same_valid.mean()
    m = np.asarray(vp_p.valid) & np.asarray(vp_v.valid) & agree_ld
    for field in ("p", "wo", "beta"):
        np.testing.assert_allclose(
            np.asarray(getattr(vp_p, field))[m],
            np.asarray(getattr(vp_v, field))[m],
            rtol=2e-5, atol=2e-5, err_msg=field)
    for field in ("kind", "fr_kind"):
        np.testing.assert_array_equal(
            np.asarray(getattr(vp_p.lobes, field))[m],
            np.asarray(getattr(vp_v.lobes, field))[m], err_msg=field)
    for field in ("c0", "c1", "eta_a", "eta_b", "a", "b",
                  "ng", "ns", "ss", "ts", "eta"):
        np.testing.assert_allclose(
            np.asarray(getattr(vp_p.lobes, field))[m],
            np.asarray(getattr(vp_v.lobes, field))[m],
            rtol=2e-5, atol=2e-5, err_msg=field)


@pytest.mark.slow
def test_sppm_photon_planar_matches_packed(scene):
    from trace_tpu.integrators.sppm import SPPMIntegrator
    from trace_tpu.integrators import common
    from trace_tpu.wavefront import sppm_photon as planar_p
    from trace_tpu.models.spheres import build_camera

    camera = build_camera(resolution=32, filename="/tmp/eqv_sppm2.png")
    integ = SPPMIntegrator(camera, initial_search_radius=0.1, max_depth=5,
                           n_iterations=2, photons_per_iteration=1024)
    assert planar_p.supports(scene)
    # A grid build from a real camera pass gives realistic cell tables.
    pixels = jnp.asarray(integ._pixel_grid()[: 32 * 32])
    valid = jnp.ones((pixels.shape[0],), bool)
    key = jax.random.key(5)
    _, vp = integ._camera_pass_body(scene, pixels, valid, key)
    radius = jnp.full((integ.n_pixels,), 0.1, jnp.float32)
    grid = integ._build_grid(vp, radius)
    grid_lo, grid_res, inv_ext = grid["lo"], grid["res"], grid["inv_extent"]
    sorted_cells = grid["sorted_cells"]
    cdf = common.light_power_cdf(scene)
    pmf = jnp.diff(jnp.concatenate([jnp.zeros(1, jnp.float32), cdf]))
    hidx = jnp.arange(1024, dtype=jnp.uint32)
    lane_valid = jnp.ones((1024,), bool)
    args = (hidx, lane_valid, cdf, pmf, grid_lo, grid_res, inv_ext,
            sorted_cells)
    sp_p = integ._photon_walk_body_packed(scene, *args)
    sp_v = planar_p.photon_walk_body(integ, scene, *args)
    # Agreement masks: discrete RR on continuous values can flip lanes.
    agree = (np.abs(np.asarray(sp_p["p"]) - np.asarray(sp_v["p"]))
             .max(axis=-1) < 1e-5)
    assert agree.mean() > 0.995, agree.mean()
    for k in ("start", "count"):
        np.testing.assert_array_equal(
            np.asarray(sp_p[k])[agree], np.asarray(sp_v[k])[agree],
            err_msg=k)
    for k in ("d", "beta"):
        np.testing.assert_allclose(
            np.asarray(sp_p[k])[agree], np.asarray(sp_v[k])[agree],
            rtol=3e-4, atol=3e-5, err_msg=k)


@pytest.mark.slow
def test_li_planar_matches_packed_metal_plastic():
    """Material coverage for the planar path beyond the shadows scene:
    Metal (GGX conductor) + Plastic (lambert + GGX coat) + rough Glass
    under the same li equality pin."""
    from trace_tpu.core import transform as T
    from trace_tpu.lights.lights import point_light, distant_light
    from trace_tpu.materials.materials import (GlassMaterial,
                                               MetalMaterial,
                                               PlasticMaterial)
    from trace_tpu.scene import SceneBuilder
    from trace_tpu.integrators import whitted as packed_w
    from trace_tpu.wavefront import whitted as planar_w

    b = SceneBuilder()
    metal = b.material(MetalMaterial(roughness=0.05))
    plastic = b.material(PlasticMaterial(Kd=(0.4, 0.2, 0.2),
                                         Ks=(0.3, 0.3, 0.3),
                                         roughness=0.2))
    rglass = b.material(GlassMaterial(u_roughness=0.1, v_roughness=0.1))
    b.sphere(T.translate([-0.5, 0.0, -2.0]), 0.4, metal)
    b.sphere(T.translate([0.5, 0.0, -2.0]), 0.4, plastic)
    b.sphere(T.translate([0.0, 0.8, -2.0]), 0.3, rglass)
    b.light(point_light(T.translate([0.0, 3.0, 0.0]), (30.0, 28.0, 25.0)))
    b.light(distant_light(T.identity(), (0.5, 0.6, 0.7), (0.3, 1.0, 0.2)))
    sc = b.build()
    assert planar_w.supports(sc)

    n = 1024
    rd = _camera_rays(n, seed=17)
    key = jax.random.key(23)
    lp, aux_p = packed_w.li(sc, rd, key, max_depth=4, return_aux=True)
    lv, aux_v = planar_w.li(sc, rd, key, max_depth=4, return_aux=True)
    a, bb = np.asarray(lp), np.asarray(lv)
    assert a.sum() > 0
    agree = np.all(np.abs(a - bb) <= 5e-5 + 5e-4 * np.abs(a), axis=-1)
    assert agree.mean() > 0.995, agree.mean()
