"""SPPM integrator tests (the reference ships none — SURVEY.md §4).

Covers the pair-expansion photon gather against a hand-built oracle, the
radius/tau update law, and a deterministic end-to-end smoke render.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trace_tpu.bxdf import bsdf as B
from trace_tpu.bxdf import lobes as lb
from trace_tpu.integrators import common
from trace_tpu.integrators.sppm import (
    SPPMIntegrator, SPPMState, VisiblePoints, initial_state, _compact_lobes,
)
from trace_tpu.models.spheres import build_scene, build_camera

pytestmark = pytest.mark.slow  # compile-heavy: full-suite tier only


F32 = jnp.float32


def _lambert_vp(n, albedo=0.6):
    ng = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    ss = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
    lobes = B.empty_lobes(n, ng=ng, ns=ng, ss=ss)
    lobes = B.set_lobe(
        lobes, 0, jnp.ones((n,), bool),
        kind=jnp.int32(lb.LAMBERTIAN_REFLECTION),
        c0=jnp.full((n, 3), albedo),
    )
    return _compact_lobes(lobes)


def _mini_integrator(n_pixels=4, radius=0.5):
    cam = build_camera(resolution=2, filename="/tmp/_sppm_mini.png")
    integ = SPPMIntegrator(cam, initial_search_radius=radius, max_depth=2,
                           n_iterations=1, photons_per_iteration=4,
                           pair_chunk=64)
    assert integ.n_pixels == n_pixels
    return integ


def test_pair_gather_matches_oracle():
    # 4 visible points on a line, one photon splat near vp0 and vp1 only.
    integ = _mini_integrator()
    n = 4
    p = jnp.asarray([[0.0, 0, 0], [0.6, 0, 0], [5.0, 0, 0], [9.0, 0, 0]])
    vp = VisiblePoints(
        p=p,
        wo=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3)),
        beta=jnp.ones((n, 3), F32),
        valid=jnp.ones((n,), bool),
        lobes=_lambert_vp(n),
    )
    radius = jnp.full((n,), 0.7, F32)
    grid = integ._build_grid(vp, radius)

    # One photon at (0.3, 0, 0) arriving straight down (-z).
    from trace_tpu.integrators.sppm import _to_grid, _hash_cells

    sp_p = jnp.asarray([[0.3, 0.0, 0.0]])
    in_b, g = _to_grid(sp_p, grid["lo"], grid["res"], grid["inv_extent"])
    cell = _hash_cells(g[:, 0], g[:, 1], g[:, 2], integ.n_pixels)
    start = jnp.searchsorted(grid["sorted_cells"], cell, side="left")
    end = jnp.searchsorted(grid["sorted_cells"], cell, side="right")
    count = jnp.where(in_b, end - start, 0).astype(jnp.int32)
    assert int(count[0]) > 0

    phi = jnp.zeros((n, 3), F32)
    m_cnt = jnp.zeros((n,), jnp.int32)
    offsets = jnp.zeros((1,), jnp.int32)
    phi, m_cnt = integ._pair_pass(
        phi, m_cnt, jnp.int32(0), count[0], offsets,
        sp_p, jnp.asarray([[0.0, 0.0, -1.0]]), jnp.ones((1, 3), F32),
        start.astype(jnp.int32), vp, radius, grid["sorted_vp"],
    )
    phi, m_cnt = np.asarray(phi), np.asarray(m_cnt)
    # vp0 (d=0.3) and vp1 (d=0.3) are within radius 0.7; vp2/vp3 are not.
    assert m_cnt.tolist() == [1, 1, 0, 0]
    np.testing.assert_allclose(phi[0], 0.6 / np.pi, rtol=1e-5)
    np.testing.assert_allclose(phi[1], 0.6 / np.pi, rtol=1e-5)
    np.testing.assert_allclose(phi[2:], 0.0)


def test_update_pixels_radius_shrink():
    integ = _mini_integrator()
    state = initial_state(4, 1.0)
    state = SPPMState(
        ld=state.ld, tau=state.tau, radius=state.radius, n=state.n,
        phi=jnp.ones((4, 3), F32),
        m=jnp.asarray([8, 0, 2, 0], jnp.int32),
    )
    new = integ._update_pixels(state, jnp.zeros((4, 3), F32))
    r = np.asarray(new.radius)
    # gamma = 2/3: r' = r * sqrt((gamma*M) / M) = r*sqrt(2/3) wherever M>0.
    assert r[0] == pytest.approx(np.sqrt(2 / 3), rel=1e-5)
    assert r[1] == 1.0
    assert r[2] == pytest.approx(np.sqrt(2 / 3), rel=1e-5)
    n = np.asarray(new.n)
    assert n[0] == pytest.approx(16 / 3, rel=1e-5)
    assert n[1] == 0.0
    tau = np.asarray(new.tau)
    np.testing.assert_allclose(tau[0], 1.0 * (2 / 3), rtol=1e-5)
    np.testing.assert_allclose(tau[1], 0.0)
    # Transient phi/M reset.
    assert np.asarray(new.phi).max() == 0.0
    assert np.asarray(new.m).max() == 0


def test_sppm_shadows_smoke_deterministic():
    scene = build_scene()
    cam = build_camera(resolution=16, filename="/tmp/_sppm16.png")

    def run():
        integ = SPPMIntegrator(
            cam, initial_search_radius=0.2, max_depth=3,
            n_iterations=2, photons_per_iteration=4096, seed=1,
        )
        state = integ.render(scene)
        return np.asarray(integ.to_image(state, 2))

    img1 = run()
    assert img1.shape == (16, 16, 3)
    assert np.isfinite(img1).all()
    assert img1.max() > 0.01
    img2 = run()
    np.testing.assert_array_equal(img1, img2)


def test_caustic_moving_frame_lights():
    # Animated-light schedule (caustic_moving.jl:58-89): light table swaps
    # per frame; scene/BVH stay fixed.
    from trace_tpu.models import caustic_moving as cm

    assert len(cm.SHIFTS) == 51
    l0 = cm.frame_lights(0.0)
    l5 = cm.frame_lights(5.0)
    assert len(l0) == 2 and l0[0]["kind"] == 0 and l0[1]["kind"] == 1
    # The spot origin rises with the shift.
    p0 = np.asarray(l0[1]["l2w"].m)[:3, 3]
    p5 = np.asarray(l5[1]["l2w"].m)[:3, 3]
    np.testing.assert_allclose(p5 - p0, [0, 5, 0], atol=1e-5)


def test_sppm_checkpoint_resume_bit_exact():
    from trace_tpu.utils.checkpoint import save_pytree, load_pytree
    scene = build_scene()
    cam = build_camera(resolution=12, filename="/tmp/_sppm_ckpt.png")
    kw = dict(initial_search_radius=0.2, max_depth=2,
              photons_per_iteration=512, seed=4)
    full = SPPMIntegrator(cam, n_iterations=2, **kw).render(scene)
    # Run 1 iteration, checkpoint, resume for the 2nd.
    integ = SPPMIntegrator(cam, n_iterations=2, **kw)
    st1 = integ.render(scene, n_iterations=1)
    save_pytree("/tmp/_sppm_state.npz", st1, metadata={"iteration": 1})
    st1b = load_pytree("/tmp/_sppm_state.npz", st1)
    resumed = integ.render(scene, state=st1b, start_iteration=2)
    np.testing.assert_array_equal(np.asarray(full.tau), np.asarray(resumed.tau))
    np.testing.assert_array_equal(np.asarray(full.ld), np.asarray(resumed.ld))
    np.testing.assert_array_equal(
        np.asarray(full.radius), np.asarray(resumed.radius))


def test_sppm_matches_path_tracer_order_of_magnitude():
    """Physics cross-check: in a closed diffuse box, SPPM's progressive
    estimate must land near the path-traced solution. The density-
    estimation kernel (initial radius 0.25 in a 2-unit box) carries
    corner bias, so bounds are generous — this catches normalization /
    estimator regressions (factor-of-pi, Np scaling, beta handling), not
    noise."""
    from trace_tpu.scene import SceneBuilder
    from trace_tpu.core import transform as T
    from trace_tpu.materials.materials import MatteMaterial
    from trace_tpu.lights.lights import point_light
    from trace_tpu.models.cornell import _quad
    from trace_tpu.integrators.path import PathIntegrator
    from trace_tpu.film.film import Film
    from trace_tpu.film.filters import LanczosSincFilter
    from trace_tpu.camera.perspective import PerspectiveCamera
    from trace_tpu.sampler.uniform import UniformSampler

    b = SceneBuilder()
    white = b.material(MatteMaterial(Kd=(0.7, 0.7, 0.7)))
    _quad(b, [[-1, -1, 1], [1, -1, 1], [1, -1, -1], [-1, -1, -1]], white)
    _quad(b, [[-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1]], white)
    _quad(b, [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1]], white)
    _quad(b, [[-1, -1, 1], [-1, -1, -1], [-1, 1, -1], [-1, 1, 1]], white)
    _quad(b, [[1, -1, -1], [1, -1, 1], [1, 1, 1], [1, 1, -1]], white)
    b.light(point_light(T.translate([0.0, 0.5, 0.0]), (5.0, 5.0, 5.0)))
    scene = b.build(use_bvh=False)

    film = Film((12, 12), filter=LanczosSincFilter((1.0, 1.0), 3.0),
                filename="/tmp/_box12.png")
    cam = PerspectiveCamera(
        T.look_at([0.0, 0.0, 140.0], [0.0, -2.8, 0.0], [0, 1, 0]), film=film
    )
    pt = PathIntegrator(cam, UniformSampler(24, seed=0), max_depth=8,
                        rr_depth=5)
    mean_pt = float(np.asarray(cam.film.to_image(pt.render(scene))).mean())

    sp = SPPMIntegrator(cam, initial_search_radius=0.25, max_depth=8,
                        n_iterations=8, photons_per_iteration=8192, seed=0)
    st = sp.render(scene)
    mean_sp = float(np.asarray(sp.to_image(st, 8)).mean())
    ratio = mean_sp / mean_pt
    assert 0.6 < ratio < 1.7, (mean_sp, mean_pt, ratio)


def test_sppm_env_light_matches_path_tracer():
    """Environment-light physics cross-check: a diffuse box OPEN toward
    +z under a constant sky. Env photons enter through the opening
    (lights.sample_le world-radius-disk emission) and bounce inside;
    SPPM's progressive estimate must land near the path-traced solution.
    Exercises env NEE + MIS (camera pass) and env photon emission + grid
    splats end-to-end."""
    from trace_tpu.scene import SceneBuilder
    from trace_tpu.core import transform as T
    from trace_tpu.materials.materials import MatteMaterial
    from trace_tpu.lights.lights import infinite_light
    from trace_tpu.models.cornell import _quad
    from trace_tpu.integrators.path import PathIntegrator
    from trace_tpu.film.film import Film
    from trace_tpu.film.filters import LanczosSincFilter
    from trace_tpu.camera.perspective import PerspectiveCamera
    from trace_tpu.sampler.uniform import UniformSampler

    b = SceneBuilder()
    white = b.material(MatteMaterial(Kd=(0.7, 0.7, 0.7)))
    _quad(b, [[-1, -1, 1], [1, -1, 1], [1, -1, -1], [-1, -1, -1]], white)
    _quad(b, [[-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1]], white)
    _quad(b, [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1]], white)
    _quad(b, [[-1, -1, 1], [-1, -1, -1], [-1, 1, -1], [-1, 1, 1]], white)
    _quad(b, [[1, -1, -1], [1, -1, 1], [1, 1, 1], [1, 1, -1]], white)
    b.light(infinite_light(radiance=(1.5, 1.5, 1.5)))  # open toward +z
    scene = b.build(use_bvh=False)

    film = Film((12, 12), filter=LanczosSincFilter((1.0, 1.0), 3.0),
                filename="/tmp/_envbox12.png")
    cam = PerspectiveCamera(
        T.look_at([0.0, 0.0, 140.0], [0.0, -2.8, 0.0], [0, 1, 0]), film=film
    )
    pt = PathIntegrator(cam, UniformSampler(24, seed=0), max_depth=8,
                        rr_depth=5)
    mean_pt = float(np.asarray(cam.film.to_image(pt.render(scene))).mean())

    sp = SPPMIntegrator(cam, initial_search_radius=0.25, max_depth=8,
                        n_iterations=8, photons_per_iteration=8192, seed=0)
    st = sp.render(scene)
    mean_sp = float(np.asarray(sp.to_image(st, 8)).mean())
    assert mean_pt > 1e-3 and mean_sp > 1e-3, (mean_sp, mean_pt)
    ratio = mean_sp / mean_pt
    assert 0.5 < ratio < 2.0, (mean_sp, mean_pt, ratio)


def test_fused_iteration_blocks_match_stepwise():
    """_iterations_fused (whole blocks in one dispatch) must reproduce
    the stepwise path exactly — same key schedule and Halton indexing."""
    import numpy as np
    import jax
    from trace_tpu.models.spheres import build_scene, build_camera
    from trace_tpu.integrators.sppm import SPPMIntegrator

    scene = build_scene()

    def run(fused, fused_block=8, fused_unroll=False):
        cam = build_camera(resolution=16, filename="/tmp/sppm_f.png")
        integ = SPPMIntegrator(
            cam, initial_search_radius=0.3, max_depth=2, n_iterations=5,
            photons_per_iteration=256, pixel_chunk=128,
            fused_iterations=fused, fused_block=fused_block,
            fused_unroll=fused_unroll,
        )
        st = integ.render(scene)
        return np.asarray(integ.to_image(st, 5))

    stepwise = run(False)
    np.testing.assert_allclose(run(True), stepwise, rtol=1e-6, atol=1e-7)
    # The dispatch-length cap (blocks 2+2+1) must cross block boundaries
    # bit-compatibly — state threads through, keys stay iteration-keyed.
    np.testing.assert_allclose(
        run(True, fused_block=2), stepwise, rtol=1e-6, atol=1e-7
    )
    # fused_block=1 is the flagship-scale configuration (one whole
    # iteration per dispatch, dispatches pipelined): same results.
    np.testing.assert_allclose(
        run(True, fused_block=1), stepwise, rtol=1e-6, atol=1e-7
    )
    # The unrolled (straight-line XLA) form of a block must match the
    # fori_loop form — it exists to isolate the program-size fault.
    np.testing.assert_allclose(
        run(True, fused_block=2, fused_unroll=True), stepwise,
        rtol=1e-6, atol=1e-7,
    )


def test_minimal_sphere_model_renders(tmp_path):
    """The minimal example scene (models.sphere, reference sphere.jl)
    renders through its own render() entry point: finite, non-black,
    PNG written."""
    from trace_tpu.models import sphere

    import os

    out = str(tmp_path / "sphere.png")
    state = sphere.render(resolution=24, iterations=2, filename=out)
    ld = np.asarray(state.ld)
    assert np.isfinite(ld).all()
    assert float(np.abs(ld).max()) > 0
    assert os.path.exists(out)
