"""Wavefront BVH walk (accel/wbvh.py) vs the brute-force oracle:
closest-hit, any-hit, finite t_max pruning, chunked+sorted dispatch, and
degenerate tiny trees. The two cheapest oracles stay in the fast tier;
the multi-compile variants (chunked, scene-attach, tiny trees) are
slow-tier."""
import numpy as np
import pytest
import jax.numpy as jnp

from trace_tpu.core import transform as T
from trace_tpu.shapes import triangle as tri_mod
from trace_tpu.accel import wbvh
from trace_tpu.accel.bvh import build_bvh


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


def _mats(tris, max_leaf=4):
    bvh = build_bvh(tri_mod.world_bounds_np(tris), max_leaf)
    return (wbvh.pack_nodes(bvh),
            wbvh.pack_leaf_tris(tris, np.asarray(bvh.prim_order, np.int64)))


def test_wbvh_closest_matches_brute():
    tris = _soup(400)
    o, d = _rays(256)
    t_max = jnp.full(256, jnp.inf)
    bh, bt, bi = _brute(tris, o, d, t_max)
    nodes, rows = _mats(tris)
    h, t, i = wbvh.traverse_batch(nodes, rows, o, d, t_max, max_leaf=4)
    np.testing.assert_array_equal(np.asarray(h), bh)
    np.testing.assert_allclose(np.asarray(t)[bh], bt[bh], atol=1e-3,
                               rtol=1e-4)
    # winner ids agree wherever the brute-force winner is unique in t
    same = np.asarray(i)[bh] == bi[bh]
    assert same.mean() > 0.99


def test_wbvh_any_hit_and_finite_tmax():
    tris = _soup(400, seed=3)
    o, d = _rays(256, seed=4)
    t_short = jnp.full(256, 4.0)
    hit, t = tri_mod.intersect_all(tris, o, d, t_short)
    bf_occ = np.asarray(jnp.any(hit & (t <= t_short[:, None]), axis=-1))
    nodes, rows = _mats(tris)
    h, t, _ = wbvh.traverse_batch(nodes, rows, o, d, t_short, max_leaf=4,
                                  any_hit=True)
    np.testing.assert_array_equal(np.asarray(h) & (np.asarray(t) <= 4.0),
                                  bf_occ)
    # closest with finite t_max prunes identically
    bh, bt, _ = _brute(tris, o, d, t_short)
    h, t, _ = wbvh.traverse_batch(nodes, rows, o, d, t_short, max_leaf=4)
    np.testing.assert_array_equal(np.asarray(h), bh)


@pytest.mark.slow
def test_wbvh_chunked_sorted_matches_single():
    tris = _soup(300, seed=5)
    bvh = build_bvh(tri_mod.world_bounds_np(tris), 4)
    nodes = wbvh.pack_nodes(bvh)
    rows = wbvh.pack_leaf_tris(tris, np.asarray(bvh.prim_order, np.int64))
    big = wbvh.WBVHAccelerator(nodes, rows, 4, ray_chunk=1 << 20,
                               sort_rays=False)
    small = wbvh.WBVHAccelerator(nodes, rows, 4, ray_chunk=64,
                                 sort_rays=True)
    o, d = _rays(400, seed=6)
    tm = jnp.full(400, jnp.inf)
    h1, t1, i1 = big._chunked(o, d, tm, False)
    h2, t2, i2 = small._chunked(o, d, tm, False)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_allclose(np.where(np.asarray(h1), np.asarray(t1), 0),
                               np.where(np.asarray(h2), np.asarray(t2), 0),
                               rtol=1e-6)
    np.testing.assert_array_equal(
        np.where(np.asarray(h1), np.asarray(i1), -1),
        np.where(np.asarray(h2), np.asarray(i2), -1))


@pytest.mark.slow
def test_wbvh_tiny_trees():
    # root-is-leaf (1 tri) and a 3-tri tree
    for nt in (1, 3):
        tris = _soup(nt, seed=10 + nt)
        o, d = _rays(64, seed=20 + nt)
        t_max = jnp.full(64, jnp.inf)
        bh, bt, _ = _brute(tris, o, d, t_max)
        nodes, rows = _mats(tris)
        h, t, _ = wbvh.traverse_batch(nodes, rows, o, d, t_max, max_leaf=4)
        np.testing.assert_array_equal(np.asarray(h), bh, err_msg=f"nt={nt}")
        np.testing.assert_allclose(np.asarray(t)[bh], bt[bh], atol=1e-3,
                                   rtol=1e-4)


@pytest.mark.slow
def test_wbvh_scene_attach_matches_brute_scene():
    """End-to-end: Scene with wbvh accel vs accel-less scene.intersect."""
    from trace_tpu.scene import SceneBuilder
    from trace_tpu.lights import lights as L
    from trace_tpu.materials.materials import MatteMaterial

    rng = np.random.default_rng(2)
    nt = 120
    c = rng.uniform(-3, 3, (nt, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.8, (nt, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.8, (nt, 3)).astype(np.float32)
    verts = np.concatenate([c, c + e1, c + e2], 0)
    idx = np.stack(
        [np.arange(nt), np.arange(nt) + nt, np.arange(nt) + 2 * nt], -1
    )

    def build(accel):
        b = SceneBuilder()
        mat = b.material(MatteMaterial(Kd=(0.5, 0.5, 0.5)))
        b.triangle_mesh(T.identity(), idx, verts, mat)
        b.light(L.point_light(T.translate([0.0, 0.0, 9.0]),
                              (5.0, 5.0, 5.0)))
        s = b.build(use_bvh=False)
        if accel:
            wbvh.attach(s)
        return s

    s0 = build(False)
    s1 = build(True)
    o, d = _rays(200, seed=30)
    tm = jnp.full(200, jnp.inf)
    h0 = s0.intersect(o, d, tm)
    h1 = s1.intersect(o, d, tm)
    np.testing.assert_array_equal(np.asarray(h0.valid), np.asarray(h1.valid))
    np.testing.assert_allclose(
        np.where(np.asarray(h0.valid), np.asarray(h0.t), 0.0),
        np.where(np.asarray(h1.valid), np.asarray(h1.t), 0.0),
        rtol=1e-5, atol=1e-5)
    occ0 = np.asarray(s0.intersect_p(o, d, jnp.full(200, 6.0)))
    occ1 = np.asarray(s1.intersect_p(o, d, jnp.full(200, 6.0)))
    np.testing.assert_array_equal(occ0, occ1)
