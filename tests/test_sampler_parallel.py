"""Stratified sampler + multi-device sharded render tests (the conftest
forces an 8-device virtual CPU mesh)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trace_tpu.sampler.stratified import StratifiedSampler, get_camera_samples
from trace_tpu.sampler.distribution import Distribution1D

pytestmark = pytest.mark.slow  # compile-heavy: full-suite tier only



def test_stratified_samples_land_in_strata():
    s = StratifiedSampler(2, 2, jitter=True, seed=0)
    assert s.samples_per_pixel == 4
    pix = jnp.asarray([[5, 9]] * 64, jnp.int32)
    seen = []
    for idx in range(4):
        p, _, _ = get_camera_samples(s, jax.random.key(idx), pix, idx)
        off = np.asarray(p) - np.array([5, 9], np.float32)
        assert (off >= 0).all() and (off < 1).all()
        sx, sy = s.stratum(idx)
        assert (off[:, 0] >= sx / 2).all() and (off[:, 0] < (sx + 1) / 2).all()
        assert (off[:, 1] >= sy / 2).all() and (off[:, 1] < (sy + 1) / 2).all()
        seen.append((sx, sy))
    assert sorted(seen) == [(0, 0), (0, 1), (1, 0), (1, 1)]


def test_stratified_integrator_runs():
    from trace_tpu.models.spheres import build_scene, build_camera
    from trace_tpu.integrators.whitted import WhittedIntegrator

    scene = build_scene()
    cam = build_camera(resolution=12, filename="/tmp/_strat12.png")
    integ = WhittedIntegrator(cam, StratifiedSampler(2, 2, seed=3),
                              max_depth=2)
    img = np.asarray(cam.film.to_image(integ.render(scene)))
    assert np.isfinite(img).all() and img.max() > 0.01


def test_distribution1d_continuous():
    d = Distribution1D([1.0, 3.0])
    # u = 0.5 falls in the second bin (cdf [0, .25, 1]); pdf = f/int = 1.5.
    x, pdf, idx = d.sample_continuous(jnp.asarray([0.5, 0.1]))
    assert int(idx[0]) == 1 and int(idx[1]) == 0
    assert float(pdf[0]) == pytest.approx(1.5)
    assert float(pdf[1]) == pytest.approx(0.5)
    assert 0.5 <= float(x[0]) < 1.0
    assert 0.0 <= float(x[1]) < 0.5


def test_render_sharded_8_devices():
    from trace_tpu.models.spheres import build_scene, build_camera
    from trace_tpu.parallel.render import make_mesh, render_sharded

    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    scene = build_scene()
    cam = build_camera(resolution=12, filename="/tmp/_shard12.png")
    mesh = make_mesh(jax.devices())
    state = render_sharded(scene, cam, mesh, spp=1, max_depth=2, seed=5)
    img = np.asarray(cam.film.to_image(state))
    assert img.shape == (12, 12, 3)
    assert np.isfinite(img).all() and img.max() > 0.01
    # Deterministic for a fixed mesh.
    state2 = render_sharded(scene, cam, mesh, spp=1, max_depth=2, seed=5)
    np.testing.assert_array_equal(img, np.asarray(cam.film.to_image(state2)))
    # Pixel-identity-keyed streams: the 8-device render draws the EXACT
    # single-chip samples; only f32 film accumulation order differs.
    from trace_tpu.integrators.whitted import WhittedIntegrator
    from trace_tpu.sampler.uniform import UniformSampler

    integ = WhittedIntegrator(cam, UniformSampler(1, seed=5), max_depth=2)
    img1 = np.asarray(cam.film.to_image(integ.render(scene)))
    np.testing.assert_allclose(img, img1, atol=2e-6)


def test_sppm_photon_sharding_bit_exact():
    # Halton-keyed photons make the sharded pass bit-identical to the
    # single-device pass (SURVEY.md §2: deterministic accumulation).
    from trace_tpu.models.spheres import build_scene, build_camera
    from trace_tpu.integrators.sppm import SPPMIntegrator
    from trace_tpu.parallel.render import make_mesh

    scene = build_scene()
    cam = build_camera(resolution=12, filename="/tmp/_sppm_sh12.png")
    mesh = make_mesh(jax.devices(), axis="photons")
    kw = dict(initial_search_radius=0.2, max_depth=2, n_iterations=1,
              photons_per_iteration=1024, seed=2)
    st_sh = SPPMIntegrator(cam, mesh=mesh, **kw).render(scene)
    st_1 = SPPMIntegrator(cam, **kw).render(scene)
    np.testing.assert_array_equal(np.asarray(st_sh.tau), np.asarray(st_1.tau))
    np.testing.assert_array_equal(np.asarray(st_sh.m), np.asarray(st_1.m))
    np.testing.assert_array_equal(
        np.asarray(st_sh.radius), np.asarray(st_1.radius)
    )


def test_sppm_full_spmd_runs():
    # Camera + photon + pair passes all SPMD over the mesh.
    from trace_tpu.models.spheres import build_scene, build_camera
    from trace_tpu.integrators.sppm import SPPMIntegrator
    from trace_tpu.parallel.render import make_mesh

    scene = build_scene()
    cam = build_camera(resolution=12, filename="/tmp/_sppm_full_spmd.png")
    mesh = make_mesh(jax.devices(), axis="px")
    integ = SPPMIntegrator(
        cam, initial_search_radius=0.2, max_depth=2, n_iterations=1,
        photons_per_iteration=1024, seed=1, mesh=mesh, shard_axis="px",
        shard_camera=True,
    )
    st = integ.render(scene)
    img = np.asarray(integ.to_image(st, 1))
    assert np.isfinite(img).all() and img.max() > 0.0
    # Full SPMD (camera + photon + pair) now matches the single-device
    # run: camera streams are pixel-identity-keyed, photons Halton-keyed.
    st1 = SPPMIntegrator(
        cam, initial_search_radius=0.2, max_depth=2, n_iterations=1,
        photons_per_iteration=1024, seed=1,
    ).render(scene)
    np.testing.assert_allclose(
        np.asarray(st.tau), np.asarray(st1.tau), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(st.m), np.asarray(st1.m))
    np.testing.assert_allclose(
        np.asarray(st.ld), np.asarray(st1.ld), atol=1e-5
    )


def test_render_chunk_invariance():
    # pixel_chunk is a pure perf knob: identity-keyed streams make the
    # image invariant to chunk boundaries (f32 add-order noise only).
    from trace_tpu.models.spheres import build_scene, build_camera
    from trace_tpu.integrators.whitted import WhittedIntegrator
    from trace_tpu.sampler.uniform import UniformSampler

    scene = build_scene()

    def render(chunk):
        cam = build_camera(resolution=16, filename="/tmp/_inv16.png")
        integ = WhittedIntegrator(cam, UniformSampler(2, seed=4),
                                  max_depth=2, pixel_chunk=chunk)
        return np.asarray(cam.film.to_image(integ.render(scene)))

    np.testing.assert_allclose(render(1 << 16), render(97), atol=2e-6)


def test_sppm_chunk_invariance():
    from trace_tpu.models.spheres import build_scene, build_camera
    from trace_tpu.integrators.sppm import SPPMIntegrator

    scene = build_scene()
    cam = build_camera(resolution=12, filename="/tmp/_sppm_inv.png")
    kw = dict(initial_search_radius=0.2, max_depth=2, n_iterations=1,
              photons_per_iteration=512, seed=7)
    st_a = SPPMIntegrator(cam, pixel_chunk=1 << 16, **kw).render(scene)
    st_b = SPPMIntegrator(cam, pixel_chunk=64, **kw).render(scene)
    np.testing.assert_allclose(
        np.asarray(st_a.tau), np.asarray(st_b.tau), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(st_a.m), np.asarray(st_b.m))


def test_sharded_sppm_helpers_cache_executables():
    # The shard_map bodies must be jitted ONCE per (integ, scene, mesh,
    # axis) — a fresh jax.jit(closure) per call would recompile the pair
    # sweep every SPPM iteration.
    from trace_tpu.parallel import sppm as psppm
    from trace_tpu.parallel.render import make_mesh

    class _I:  # hashable stand-ins
        n_pixels = 8
    i, s = _I(), _I()
    mesh = make_mesh(jax.devices("cpu")[:2])
    assert psppm._photon_walk_jit(i, s, mesh, "rays") is \
        psppm._photon_walk_jit(i, s, mesh, "rays")
    assert psppm._pair_jit(i, mesh, "rays", 4) is \
        psppm._pair_jit(i, mesh, "rays", 4)
    assert psppm._camera_pass_jit(i, s, mesh, "rays") is \
        psppm._camera_pass_jit(i, s, mesh, "rays")
