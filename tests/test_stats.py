"""RenderStats observability: structured per-pass counters (SURVEY §5 —
the reference only has ProgressMeter bars, Trace.jl:39-44)."""
import pytest
import numpy as np

from trace_tpu.utils.stats import RenderStats

pytestmark = pytest.mark.slow  # compile-heavy: full-suite tier only



def test_counters_and_timers():
    st = RenderStats()
    st.add("x", 2)
    st.add("x", 3)
    st.start("render")
    st.stop("render")
    d = st.as_dict()
    assert d["x"] == 5
    assert d["render_seconds"] >= 0
    st.counters["rays_dispatched"] = 2e6
    st.counters["render_seconds"] = 1.0
    assert st.mrays_per_sec() == 2.0


def test_whitted_render_populates_stats():
    from trace_tpu.models.spheres import build_scene, build_camera
    from trace_tpu.integrators.whitted import WhittedIntegrator
    from trace_tpu.sampler.uniform import UniformSampler

    stats = RenderStats()
    scene = build_scene()
    cam = build_camera(resolution=16, filename="/tmp/_stats_w.png")
    integ = WhittedIntegrator(cam, UniformSampler(1), max_depth=2,
                              stats=stats)
    integ.render(scene)
    d = stats.as_dict()
    assert d["camera_samples"] > 0
    assert d["render_seconds"] > 0
    # All shipped scenes must run without silent specular-queue drops.
    assert d.get("specular_queue_drops", 0) == 0


def test_sppm_render_populates_stats():
    from trace_tpu.models.spheres import build_scene, build_camera
    from trace_tpu.integrators.sppm import SPPMIntegrator

    stats = RenderStats()
    scene = build_scene()
    cam = build_camera(resolution=16, filename="/tmp/_stats_s.png")
    integ = SPPMIntegrator(cam, initial_search_radius=0.3, max_depth=2,
                           n_iterations=2, photons_per_iteration=128,
                           pixel_chunk=128, stats=stats)
    integ.render(scene)
    d = stats.as_dict()
    n_pix = 16 * 16
    assert d["photons_traced"] == 2 * 128
    assert d["camera_rays"] == 2 * n_pix
    assert d["photon_vp_pairs"] >= 0
    # Per-iteration live VPs are bounded by the pixel count; at least
    # some camera rays must land on geometry in this scene.
    assert 0 < d["visible_points"] <= 2 * n_pix
    # Each VP emits at most 8 grid entries; occupancy is positive and
    # bounded by both the hash-table size and the entry count.
    assert 0 < d["grid_cells_occupied"] <= min(2 * n_pix, 8 * d["visible_points"])


def test_trace_profile_writes_perfetto_trace(tmp_path):
    import jax.numpy as jnp
    from trace_tpu.utils.stats import trace_profile

    out = tmp_path / "prof"
    with trace_profile(str(out)):
        x = jnp.sqrt(jnp.arange(128.0))
    files = list(out.rglob("*"))
    assert any(f.suffix in (".gz", ".json", ".pb") or "trace" in f.name
               for f in files if f.is_file()), files
