"""Pallas sparse-sweep kernel vs brute-force watertight oracle
(interpret mode on CPU; the on-chip benchmark lives in docs/BASELINE)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from trace_tpu.core import transform as T
from trace_tpu.shapes import triangle as tri_mod
from trace_tpu.accel import clusters as CL
from trace_tpu.ops.sweep_pallas import PallasSweepAccelerator

pytestmark = pytest.mark.slow  # compile-heavy: full-suite tier only



def _soup(nt, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-5, 5, (nt, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.6, (nt, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.6, (nt, 3)).astype(np.float32)
    verts = np.concatenate([c, c + e1, c + e2], 0)
    idx = np.stack(
        [np.arange(nt), np.arange(nt) + nt, np.arange(nt) + 2 * nt], -1
    )
    return tri_mod.pack_triangle_mesh(T.identity(), idx, verts)


def _rays(nr, seed=1):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-8, 8, (nr, 3)).astype(np.float32))
    d = rng.normal(0, 1, (nr, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d)


def _brute(tris, o, d, t_max):
    hit, t = tri_mod.intersect_all(tris, o, d, t_max)
    t = jnp.where(hit, t, jnp.inf)
    i = jnp.argmin(t, axis=-1).astype(jnp.int32)
    bt = jnp.min(t, axis=-1)
    return np.isfinite(np.asarray(bt)), np.asarray(bt), np.asarray(i)


def test_sweep_kernel_matches_brute_force():
    tris = _soup(700, seed=11)
    o, d = _rays(300, seed=12)  # odd count -> block padding
    t_max = jnp.full(300, jnp.inf)
    bh, bt, bi = _brute(tris, o, d, t_max)

    accel = CL.build_clusters(tris, leaf_tris=16)
    sw = PallasSweepAccelerator(accel, group=4, block_rays=128,
                                ray_chunk=256, interpret=True)
    h, t, i = sw._chunked(o, d, t_max, False)
    np.testing.assert_array_equal(np.asarray(h), bh)
    np.testing.assert_allclose(np.asarray(t)[bh], bt[bh], atol=1e-3,
                               rtol=1e-4)
    # The MT factorization can differ in t at f32 on skewed triangles;
    # ids must agree wherever the two ts do (duplicate-surface ties are
    # legitimate either way).
    same_t = bh & np.isclose(np.asarray(t), bt, atol=1e-4, rtol=1e-5)
    agree = (np.asarray(i) == bi)[same_t]
    assert agree.mean() > 0.99


def test_sweep_kernel_pipelined_bit_identical():
    # The double-buffered (DMA-prefetch) kernel variant must produce
    # bit-identical hits to the single-buffer kernel: same demand order,
    # same epilogue, only the copy/compute overlap differs.
    tris = _soup(600, seed=41)
    o, d = _rays(260, seed=42)
    t_max = jnp.full(260, jnp.inf)
    accel = CL.build_clusters(tris, leaf_tris=16)
    base = PallasSweepAccelerator(accel, group=4, block_rays=128,
                                  ray_chunk=512, interpret=True)
    pipe = PallasSweepAccelerator(accel, group=4, block_rays=128,
                                  ray_chunk=512, interpret=True,
                                  pipeline=True)
    h0, t0, i0 = base._chunked(o, d, t_max, False)
    h1, t1, i1 = pipe._chunked(o, d, t_max, False)
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    # any-hit leg too (different cond)
    ts = jnp.full(260, 5.0)
    np.testing.assert_array_equal(
        np.asarray(base._chunked(o, d, ts, True)[0]),
        np.asarray(pipe._chunked(o, d, ts, True)[0]),
    )


def test_sweep_kernel_bf16_panel_mostly_agrees():
    # panel_bf16 halves the per-step DMA bytes at the cost of ~2^-8
    # relative constant error: hits must agree except near triangle
    # boundaries. This pins the A/B knob's CPU semantics; the on-chip
    # speed/agreement A/B is recorded by bench.py.
    tris = _soup(500, seed=51)
    o, d = _rays(400, seed=52)
    t_max = jnp.full(400, jnp.inf)
    accel = CL.build_clusters(tris, leaf_tris=16)
    ref = PallasSweepAccelerator(accel, group=4, block_rays=128,
                                 ray_chunk=512, interpret=True)
    bf = PallasSweepAccelerator(accel, group=4, block_rays=128,
                                ray_chunk=512, interpret=True,
                                panel_bf16=True)
    h0, t0, i0 = (np.asarray(x) for x in ref._chunked(o, d, t_max, False))
    h1, t1, i1 = (np.asarray(x) for x in bf._chunked(o, d, t_max, False))
    assert np.mean(h0 != h1) < 0.05
    both = h0 & h1 & (i0 == i1)   # same winner: t differs only by the
    assert both.sum() > 50        # constants' bf16 rounding
    np.testing.assert_allclose(t1[both], t0[both], rtol=5e-2, atol=5e-2)
    assert np.mean((i0 != i1)[h0 & h1]) < 0.10  # near-tie winner swaps


def test_sweep_kernel_bf16_hilo_near_exact():
    # panel_hilo: hi/lo double-bf16 split reconstructed as f32(hi)+f32(lo)
    # in VMEM — constants accurate to ~2^-18 relative (vs bf16's 2^-9), so
    # hits/ids must agree with the f32 kernel except a vanishing boundary
    # sliver, and t must match to the split error.
    tris = _soup(500, seed=51)
    o, d = _rays(400, seed=52)
    t_max = jnp.full(400, jnp.inf)
    accel = CL.build_clusters(tris, leaf_tris=16)
    ref = PallasSweepAccelerator(accel, group=4, block_rays=128,
                                 ray_chunk=512, interpret=True)
    hl = PallasSweepAccelerator(accel, group=4, block_rays=128,
                                ray_chunk=512, interpret=True,
                                panel_hilo=True)
    h0, t0, i0 = (np.asarray(x) for x in ref._chunked(o, d, t_max, False))
    h1, t1, i1 = (np.asarray(x) for x in hl._chunked(o, d, t_max, False))
    assert np.mean(h0 != h1) < 0.005
    both = h0 & h1 & (i0 == i1)
    assert both.sum() > 50
    np.testing.assert_allclose(t1[both], t0[both], rtol=1e-4, atol=1e-4)
    assert np.mean((i0 != i1)[h0 & h1]) < 0.01


def test_sweep_kernel_bf16_certified_superset():
    # bf16 panel + certified widening sized to BF16_PANEL_ERR_EPS: a
    # conservative SUPERSET of the f32 acceptance at half the DMA bytes —
    # no f32 hit may be dropped (extra boundary hits are allowed).
    tris = _soup(500, seed=81)
    o, d = _rays(400, seed=82)
    t_max = jnp.full(400, jnp.inf)
    accel = CL.build_clusters(tris, leaf_tris=16)
    ref = PallasSweepAccelerator(accel, group=4, block_rays=128,
                                 ray_chunk=512, interpret=True)
    bc = PallasSweepAccelerator(accel, group=4, block_rays=128,
                                ray_chunk=512, interpret=True,
                                panel_bf16=True, certified=True)
    h0, t0, i0 = (np.asarray(x) for x in ref._chunked(o, d, t_max, False))
    h1, t1, i1 = (np.asarray(x) for x in bc._chunked(o, d, t_max, False))
    assert (h1 | ~h0).all()
    # Closest-hit winners can change where the bf16-wide fattening admits
    # a nearer boundary graze (the cost of conservatism at 2^-9 widths) —
    # t must agree to bf16 tolerance wherever the winner is unchanged,
    # and most winners must be unchanged.
    same = h0 & h1 & (i0 == i1)
    assert same.sum() > 0.8 * h0.sum()
    # t carries the constants' bf16 rounding, amplified where the d.n
    # contraction cancels — same tolerance as the plain bf16-panel test.
    np.testing.assert_allclose(t1[same], t0[same], rtol=5e-2, atol=5e-2)
    # The natural deployment is the shadow/occlusion leg: any-hit must be
    # a strict superset too.
    ts = jnp.full(400, 6.0)
    a0 = np.asarray(ref._chunked(o, d, ts, True)[0])
    a1 = np.asarray(bc._chunked(o, d, ts, True)[0])
    assert (a1 | ~a0).all()


def test_sweep_kernel_collect_stats():
    # The roofline instrumentation: per-block sweep step counts come back
    # as a third kernel output; total steps bound by blocks x supers.
    tris = _soup(300, seed=61)
    o, d = _rays(256, seed=62)
    t_max = jnp.full(256, jnp.inf)
    accel = CL.build_clusters(tris, leaf_tris=16)
    sw = PallasSweepAccelerator(accel, group=4, block_rays=128,
                                ray_chunk=256, interpret=True,
                                collect_stats=True)
    sw._last_steps = []
    h, t, i = sw._chunked(o, d, t_max, False)
    bh, bt, bi = _brute(tris, o, d, t_max)
    np.testing.assert_array_equal(np.asarray(h), bh)  # stats path exact
    total = int(sum(np.asarray(s) for s in sw._last_steps))
    nb = 256 // 128
    assert 0 < total <= 2 * nb * sw.tables.n_supers  # 2 chunks


def test_sweep_kernel_certified_superset():
    # certified=True must never lose a hit the plain kernel finds.
    tris = _soup(400, seed=71)
    o, d = _rays(300, seed=72)
    t_max = jnp.full(300, jnp.inf)
    accel = CL.build_clusters(tris, leaf_tris=16)
    plain = PallasSweepAccelerator(accel, group=4, block_rays=128,
                                   ray_chunk=512, interpret=True)
    cert = PallasSweepAccelerator(accel, group=4, block_rays=128,
                                  ray_chunk=512, interpret=True,
                                  certified=True)
    h0, t0, _ = (np.asarray(x) for x in plain._chunked(o, d, t_max, False))
    h1, t1, _ = (np.asarray(x) for x in cert._chunked(o, d, t_max, False))
    assert (h1 | ~h0).all()
    np.testing.assert_allclose(t1[h0], t0[h0], rtol=1e-5, atol=1e-6)


def test_sweep_kernel_any_hit():
    tris = _soup(500, seed=13)
    o, d = _rays(257, seed=14)
    t_short = jnp.full(257, 4.0)
    hit, t = tri_mod.intersect_all(tris, o, d, t_short)
    bf_occ = np.asarray(jnp.any(hit & (t <= t_short[:, None]), axis=-1))

    accel = CL.build_clusters(tris, leaf_tris=16)
    sw = PallasSweepAccelerator(accel, group=4, block_rays=128,
                                ray_chunk=512, interpret=True)
    occ = np.asarray(
        sw._chunked(o, d, t_short, True)[0]
    )
    np.testing.assert_array_equal(occ, bf_occ)


def test_sweep_kernel_finite_t_max():
    tris = _soup(300, seed=15)
    o, d = _rays(130, seed=16)
    t_max = jnp.full(130, 6.0)
    bh, bt, bi = _brute(tris, o, d, t_max)
    accel = CL.build_clusters(tris, leaf_tris=16)
    sw = PallasSweepAccelerator(accel, group=8, block_rays=128,
                                ray_chunk=512, interpret=True)
    h, t, i = sw._chunked(o, d, t_max, False)
    np.testing.assert_array_equal(np.asarray(h), bh)
    np.testing.assert_allclose(np.asarray(t)[bh], bt[bh], atol=1e-3,
                               rtol=1e-4)


def test_sweep_refit_matches_rebuild():
    # Moving vertices + accel.refit must equal a fresh accelerator built
    # on the moved geometry (the kernel reads SweepTables, so refit must
    # repack them, not just swap the ClusterAccel).
    tris = _soup(400, seed=31)
    accel = CL.build_clusters(tris, leaf_tris=16)
    sw = PallasSweepAccelerator(accel, group=4, block_rays=128,
                                ray_chunk=512, interpret=True)
    shift = np.array([0.3, -0.2, 0.15], np.float32)
    v0 = np.asarray(tris.v0) + shift
    v1 = np.asarray(tris.v1) + shift
    v2 = np.asarray(tris.v2) + shift
    sw.refit(v0, v1, v2)

    import dataclasses
    moved = dataclasses.replace(tris, v0=v0, v1=v1, v2=v2)
    fresh = PallasSweepAccelerator(CL.build_clusters(moved, leaf_tris=16),
                                   group=4, block_rays=128,
                                   ray_chunk=512, interpret=True)
    o, d = _rays(150, seed=32)
    t_max = jnp.full(150, jnp.inf)
    h_r, t_r, i_r = sw._chunked(o, d, t_max, False)
    bh, bt, bi = _brute(moved, o, d, t_max)
    np.testing.assert_array_equal(np.asarray(h_r), bh)
    np.testing.assert_allclose(np.asarray(t_r)[bh], bt[bh], atol=1e-3,
                               rtol=1e-4)
    h_f, t_f, _ = fresh._chunked(o, d, t_max, False)
    np.testing.assert_array_equal(np.asarray(h_r), np.asarray(h_f))


def test_scene_builder_pallas_sweep_flag():
    # accelerator="pallas_sweep" must render end-to-end (interpreter off
    # TPU) and agree with the default cluster accelerator.
    import jax
    from trace_tpu.scene import SceneBuilder
    from trace_tpu.core import transform as T
    from trace_tpu.materials.materials import MatteMaterial
    from trace_tpu.lights.lights import point_light

    tris = _soup(200, seed=21)
    verts = np.concatenate(
        [np.asarray(tris.v0), np.asarray(tris.v1), np.asarray(tris.v2)], 0
    )
    idx = np.stack([np.arange(200), np.arange(200) + 200,
                    np.arange(200) + 400], -1)

    def build(accel):
        b = SceneBuilder()
        mat = b.material(MatteMaterial())
        b.triangle_mesh(T.identity(), idx, verts, mat)
        b.light(point_light(T.translate([0.0, 10.0, 0.0]),
                            (100.0, 100.0, 100.0)))
        return b.build(accelerator=accel)

    sp = build("pallas_sweep")
    from trace_tpu.ops.sweep_pallas import PallasSweepAccelerator
    assert isinstance(sp.accel, PallasSweepAccelerator)
    sc = build("clusters")
    o, d = _rays(200, seed=22)
    tm = jnp.full(200, jnp.inf)
    hp = jax.jit(lambda: sp.intersect(o, d, tm))()
    hc = jax.jit(lambda: sc.intersect(o, d, tm))()
    np.testing.assert_array_equal(np.asarray(hp.valid), np.asarray(hc.valid))
    both = np.asarray(hp.valid)
    np.testing.assert_allclose(np.asarray(hp.t)[both],
                               np.asarray(hc.t)[both], atol=1e-3, rtol=1e-4)
