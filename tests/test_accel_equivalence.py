"""Cross-validation of every acceleration path against brute force:
cluster sweep (VPU watertight + MXU Moller-Trumbore stages), per-lane BVH
traversal, MXU all-pairs, and the Pallas kernels (interpret mode)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from trace_tpu.core import transform as T
from trace_tpu.shapes import triangle as tri_mod
from trace_tpu.accel import clusters as CL
from trace_tpu.accel import mxu as MX
from trace_tpu.accel.bvh import build_bvh, _traverse_one

pytestmark = pytest.mark.slow  # compile-heavy: full-suite tier only



def _soup(nt, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-5, 5, (nt, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.6, (nt, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.6, (nt, 3)).astype(np.float32)
    verts = np.concatenate([c, c + e1, c + e2], 0)
    idx = np.stack([np.arange(nt), np.arange(nt) + nt, np.arange(nt) + 2 * nt], -1)
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
    bt = jnp.take_along_axis(t, i[:, None], -1)[:, 0]
    return np.isfinite(np.asarray(bt)), np.asarray(bt), np.asarray(i)


def test_all_accelerators_agree():
    tris = _soup(400)
    o, d = _rays(256)
    t_max = jnp.full(256, jnp.inf)
    bh, bt, bi = _brute(tris, o, d, t_max)

    acc = CL.build_clusters(tris, leaf_tris=16)
    for use_mxu in (False, True):
        h, t, i = CL.traverse(acc, o, d, t_max, 8, False, use_mxu=use_mxu)
        np.testing.assert_array_equal(np.asarray(h), bh,
                                      err_msg=f"mxu={use_mxu}")
        np.testing.assert_allclose(
            np.asarray(t)[bh], bt[bh], atol=1e-3, rtol=1e-4
        )

    bvh = build_bvh(tri_mod.world_bounds_np(tris), 4)
    h, t, i = jax.vmap(
        lambda oo, dd, tt: _traverse_one(bvh, tris, oo, dd, tt, 4, False)
    )(o, d, t_max)
    np.testing.assert_array_equal(np.asarray(h), bh)

    consts = MX.build_consts(tris)
    macc = MX.MXUAccelerator(consts, 400, tri_chunk=128)
    h, t, i = macc._sweep(o, d, t_max, False)
    np.testing.assert_array_equal(np.asarray(h), bh)
    np.testing.assert_allclose(np.asarray(t)[bh], bt[bh], atol=1e-3, rtol=1e-4)


def test_two_level_super_clusters_agree():
    # super_size > 1 (two-level entry, VERDICT r1 item 3) must be exact:
    # super entries lower-bound member cluster entries, so the early-out
    # stays conservative. Test both closest and any-hit, odd C (padding).
    tris = _soup(400, seed=7)
    o, d = _rays(256, seed=8)
    t_max = jnp.full(256, jnp.inf)
    bh, bt, bi = _brute(tris, o, d, t_max)

    for g in (4, 16):
        acc = CL.build_clusters(tris, leaf_tris=16, super_size=g)
        assert acc.super_size == g
        assert acc.c_lo.shape[0] % g == 0  # padded to whole supers
        h, t, i = CL.traverse(acc, o, d, t_max, 16, False)
        np.testing.assert_array_equal(np.asarray(h), bh, err_msg=f"g={g}")
        np.testing.assert_allclose(
            np.asarray(t)[bh], bt[bh], atol=1e-3, rtol=1e-4
        )

        t_short = jnp.full(256, 4.0)
        hit, tt = tri_mod.intersect_all(tris, o, d, t_short)
        bf_occ = np.asarray(jnp.any(hit & (tt <= t_short[:, None]), axis=-1))
        h, t, _ = CL.traverse(acc, o, d, t_short, 16, True)
        np.testing.assert_array_equal(
            np.asarray(h) & (np.asarray(t) <= 4.0), bf_occ
        )

    # Refit keeps super bounds in sync.
    acc = CL.build_clusters(tris, leaf_tris=16, super_size=8)
    shift = np.float32([0.3, -0.2, 0.1])
    moved = jax.tree.map(np.asarray, tris)
    import dataclasses
    moved = dataclasses.replace(
        moved, v0=moved.v0 + shift, v1=moved.v1 + shift, v2=moved.v2 + shift
    )
    refit = CL.refit_clusters(acc, moved.v0, moved.v1, moved.v2)
    bh2, bt2, _ = _brute(moved, o, d, t_max)
    h, t, _ = CL.traverse(refit, o, d, t_max, 16, False)
    np.testing.assert_array_equal(np.asarray(h), bh2)
    np.testing.assert_allclose(np.asarray(t)[bh2], bt2[bh2], atol=1e-3,
                               rtol=1e-4)


def test_any_hit_agrees():
    tris = _soup(400, seed=3)
    o, d = _rays(256, seed=4)
    t_short = jnp.full(256, 4.0)
    hit, t = tri_mod.intersect_all(tris, o, d, t_short)
    bf_occ = np.asarray(jnp.any(hit & (t <= t_short[:, None]), axis=-1))

    acc = CL.build_clusters(tris, leaf_tris=16)
    h, t, _ = CL.traverse(acc, o, d, t_short, 8, True)
    np.testing.assert_array_equal(np.asarray(h) & (np.asarray(t) <= 4.0), bf_occ)


def test_pallas_fused_mxu_kernel_agrees():
    from trace_tpu.ops.intersect_pallas import PallasMXUAccelerator

    tris = _soup(300, seed=7)
    o, d = _rays(256, seed=8)
    t_max = jnp.full(256, jnp.inf)
    bh, bt, bi = _brute(tris, o, d, t_max)
    acc = PallasMXUAccelerator(tris, interpret=True)
    h, t, i = acc.traverse(o, d, t_max)
    np.testing.assert_array_equal(np.asarray(h), bh)
    np.testing.assert_allclose(np.asarray(t)[bh], bt[bh], atol=1e-3, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(i)[bh], bi[bh])


def test_morton_device_build_agrees():
    # On-device Morton cluster build: different cut than SAH, identical
    # traversal results (the sweep's exactness is cut-independent).
    from trace_tpu.accel.morton import build_clusters_device

    tris = _soup(400, seed=9)
    o, d = _rays(256, seed=10)
    t_max = jnp.full(256, jnp.inf)
    bh, bt, bi = _brute(tris, o, d, t_max)
    acc = build_clusters_device(tris, leaf_tris=16)
    h, t, i = CL.traverse(acc, o, d, t_max, 8, False)
    np.testing.assert_array_equal(np.asarray(h), bh)
    np.testing.assert_allclose(np.asarray(t)[bh], bt[bh], atol=1e-3, rtol=1e-4)


def test_cluster_refit_matches_rebuild():
    # Move the geometry; refit (fixed block topology) must give identical
    # traversal results to the SAH-rebuilt accelerator.
    from trace_tpu.accel.clusters import refit_clusters

    tris = _soup(300, seed=12)
    acc = CL.build_clusters(tris, leaf_tris=16)
    shift = jnp.asarray([1.0, -0.5, 2.0])
    v0, v1, v2 = tris.v0 + shift, tris.v1 + shift, tris.v2 + shift
    refit = refit_clusters(acc, v0, v1, v2)

    import dataclasses
    moved = dataclasses.replace(tris, v0=v0, v1=v1, v2=v2)
    o, d = _rays(200, seed=13)
    t_max = jnp.full(200, jnp.inf)
    bh, bt, bi = _brute(moved, o, d, t_max)
    h, t, i = CL.traverse(refit, o, d, t_max, 8, False)
    np.testing.assert_array_equal(np.asarray(h), bh)
    np.testing.assert_allclose(np.asarray(t)[bh], bt[bh], atol=1e-3, rtol=1e-4)


def test_sorted_multichunk_traversal_matches_single_chunk():
    """Coherence sort + chunking (accel/clusters.py ClusterAccelerator)
    must reorder work only — results identical to one unsorted chunk."""
    import numpy as np
    import jax.numpy as jnp
    from trace_tpu.accel import clusters as CL

    tris = _soup(400, seed=5)
    acc = CL.build_clusters(tris, leaf_tris=16)
    big = CL.ClusterAccelerator(acc, ray_chunk=1 << 20, sort_rays=False)
    small = CL.ClusterAccelerator(acc, ray_chunk=64, sort_rays=True)

    rng = np.random.default_rng(11)
    n = 400
    o = jnp.asarray(rng.normal(0, 2, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32))
    tm = jnp.full((n,), np.inf, jnp.float32)

    h1, t1, i1 = big._chunked(o, d, tm, False)
    h2, t2, i2 = small._chunked(o, d, tm, False)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_allclose(
        np.where(np.asarray(h1), np.asarray(t1), 0),
        np.where(np.asarray(h2), np.asarray(t2), 0), rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.where(np.asarray(h1), np.asarray(i1), -1),
        np.where(np.asarray(h2), np.asarray(i2), -1),
    )


def test_native_cluster_cut_matches_python():
    """bvh_cluster_cut (native/bvh_builder.cpp) vs the per-node Python
    loops it replaces (_subtree_ranges + the cut stack): identical nodes,
    range starts, and counts at several cut sizes."""
    import trace_tpu.native as N

    tris = _soup(977, seed=7)
    bounds = tri_mod.world_bounds_np(tris)
    bvh = build_bvh(bounds, 4)
    for leaf in (4, 32, 128):
        native_cut = CL._cluster_cut(bvh, leaf)
        saved = N._lib, N._load_attempted
        N._lib, N._load_attempted = None, True
        try:
            py_cut = CL._cluster_cut(bvh, leaf)
        finally:
            N._lib, N._load_attempted = saved
        for a, b in zip(native_cut, py_cut):
            assert a.shape == b.shape
            np.testing.assert_array_equal(a, b)


def test_native_cluster_pack_matches_numpy():
    """cluster_pack (native/bvh_builder.cpp) vs the numpy packing it
    replaces: bit-exact packed vertex blocks, f64-rounded Moller-Trumbore
    constants, and refit bounds (the library builds with -ffp-contract=off
    precisely so these roundings agree)."""
    import trace_tpu.native as N

    rng = np.random.default_rng(3)
    nt, leaf = 733, 32
    v0 = rng.uniform(-5, 5, (nt, 3)).astype(np.float32)
    v1 = (v0 + rng.normal(0, 0.4, (nt, 3))).astype(np.float32)
    v2 = (v0 + rng.normal(0, 0.4, (nt, 3))).astype(np.float32)
    c = (nt + leaf - 1) // leaf
    tid = np.full((c, leaf), -1, np.int32)
    tid.reshape(-1)[:nt] = rng.permutation(nt).astype(np.int32)
    native_pack = CL._pack_blocks(v0, v1, v2, tid, leaf, want_bounds=True)
    saved = N._lib, N._load_attempted
    N._lib, N._load_attempted = None, True
    try:
        py_pack = CL._pack_blocks(v0, v1, v2, tid, leaf, want_bounds=True)
    finally:
        N._lib, N._load_attempted = saved
    for a, b in zip(native_pack, py_pack):
        assert a.shape == b.shape
        np.testing.assert_array_equal(a, b)


def test_bf16_entry_culling_is_exact():
    """entry_bf16 truncates the entry table onto the bf16 grid (a LOWER
    bound), so the sweep must return BIT-IDENTICAL hits/t/ids to the f32
    entry path — the early-out only ever loosens. Covers both the flat
    and the two-level (super_size > 1) tables."""
    tris = _soup(400, seed=7)
    o, d = _rays(512, seed=9)
    t_max = jnp.full(512, jnp.inf)
    for super_size in (1, 8):
        acc = CL.build_clusters(tris, leaf_tris=16, super_size=super_size)
        h0, t0, i0 = CL.traverse(acc, o, d, t_max, 8, False, entry_bf16=False)
        h1, t1, i1 = CL.traverse(acc, o, d, t_max, 8, False, entry_bf16=True)
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        # and against brute force
        bh, bt, bi = _brute(tris, o, d, t_max)
        np.testing.assert_array_equal(np.asarray(h1), bh)
