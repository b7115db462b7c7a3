"""BVH build/traversal and PLY-loader tests.

Counterpart of the reference BVH suite (test/test_intersection.jl:129-195)
— correctness is asserted against the brute-force intersector instead of
hand-picked rays, which subsumes the nested/heterogeneous cases.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trace_tpu.accel.bvh import build_bvh, _traverse_one, attach
from trace_tpu.core import transform as T
from trace_tpu.lights import lights as L
from trace_tpu.materials.materials import MatteMaterial
from trace_tpu.scene import SceneBuilder
from trace_tpu.shapes import triangle as tri_mod


def _random_soup(nt, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-5, 5, (nt, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.5, (nt, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.5, (nt, 3)).astype(np.float32)
    verts = np.concatenate([c, c + e1, c + e2], 0)
    idx = np.stack(
        [np.arange(nt), np.arange(nt) + nt, np.arange(nt) + 2 * nt], -1
    )
    return tri_mod.pack_triangle_mesh(T.identity(), idx, verts)


def _random_rays(nr, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-8, 8, (nr, 3)).astype(np.float32)
    d = rng.normal(0, 1, (nr, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_bvh_matches_brute_force():
    tris = _random_soup(300)
    bvh = build_bvh(tri_mod.world_bounds_np(tris), 4)
    o, d = _random_rays(200)
    t_max = jnp.full(200, jnp.inf)
    bf = tri_mod.intersect_closest(tris, o, d, t_max)
    bv = jax.vmap(
        lambda oo, dd, tt: _traverse_one(bvh, tris, oo, dd, tt, 4, False)
    )(o, d, t_max)
    np.testing.assert_array_equal(np.asarray(bf[0]), np.asarray(bv[0]))
    both = np.asarray(bf[0])
    np.testing.assert_allclose(
        np.asarray(bf[1])[both], np.asarray(bv[1])[both], rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(bf[2])[both], np.asarray(bv[2])[both])


def test_bvh_any_hit_matches_brute_force():
    tris = _random_soup(300, seed=3)
    bvh = build_bvh(tri_mod.world_bounds_np(tris), 4)
    o, d = _random_rays(200, seed=4)
    t_short = jnp.full(200, 3.0)
    h_all, t_all = tri_mod.intersect_all(tris, o, d, t_short)
    bf_occ = np.asarray(jnp.any(h_all & (t_all <= t_short[:, None]), axis=-1))
    av = jax.vmap(
        lambda oo, dd, tt: _traverse_one(bvh, tris, oo, dd, tt, 4, True)
    )(o, d, t_short)
    bv_occ = np.asarray(av[0]) & (np.asarray(av[1]) <= 3.0)
    np.testing.assert_array_equal(bf_occ, bv_occ)


def test_scene_with_bvh_matches_without():
    # Same scene, accel on/off -> identical SurfaceHits.
    def build(use_bvh):
        b = SceneBuilder()
        mat = b.material(MatteMaterial())
        rng = np.random.default_rng(7)
        c = rng.uniform(-3, 3, (128, 3)).astype(np.float32)
        e1 = rng.normal(0, 0.4, (128, 3)).astype(np.float32)
        e2 = rng.normal(0, 0.4, (128, 3)).astype(np.float32)
        verts = np.concatenate([c, c + e1, c + e2], 0)
        idx = np.stack([np.arange(128), np.arange(128) + 128,
                        np.arange(128) + 256], -1)
        b.triangle_mesh(T.identity(), idx, verts, mat)
        b.sphere(T.translate([0.0, 0.0, 0.0]), 1.0, mat)
        b.light(L.point_light(T.identity(), (1.0, 1.0, 1.0)))
        return b.build(use_bvh=use_bvh)

    s_bf = build(False)
    s_bvh = build(True)
    assert s_bvh.accel is not None and s_bf.accel is None
    o, d = _random_rays(100, seed=9)
    t_max = jnp.full(100, jnp.inf)
    h1 = s_bf.intersect(o, d, t_max)
    h2 = s_bvh.intersect(o, d, t_max)
    np.testing.assert_array_equal(np.asarray(h1.valid), np.asarray(h2.valid))
    v = np.asarray(h1.valid)
    np.testing.assert_allclose(
        np.asarray(h1.t)[v], np.asarray(h2.t)[v], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(h1.prim_id)[v], np.asarray(h2.prim_id)[v]
    )
    occ1 = np.asarray(s_bf.intersect_p(o, d, jnp.full(100, 4.0)))
    occ2 = np.asarray(s_bvh.intersect_p(o, d, jnp.full(100, 4.0)))
    np.testing.assert_array_equal(occ1, occ2)


def test_ply_loader_caustic_glass():
    from trace_tpu.io.ply import load_ply

    m = load_ply("/root/reference/docs/src/assets/models/caustic-glass.ply")
    assert m["vertices"].shape == (44034, 3)
    assert m["normals"].shape == (44034, 3)
    assert m["indices"].shape == (88064, 3)
    assert m["indices"].min() == 0
    assert m["indices"].max() == 44033
    # Normals are unit-ish.
    n = np.linalg.norm(m["normals"], axis=-1)
    assert np.all(n > 0.5) and np.all(n < 1.5)


def test_ply_ascii_roundtrip(tmp_path):
    path = tmp_path / "tri.ply"
    path.write_text(
        "ply\nformat ascii 1.0\n"
        "element vertex 4\nproperty float x\nproperty float y\nproperty float z\n"
        "element face 2\nproperty list uchar int vertex_indices\nend_header\n"
        "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
        "3 0 1 2\n3 0 2 3\n"
    )
    from trace_tpu.io.ply import load_ply

    m = load_ply(str(path))
    assert m["vertices"].shape == (4, 3)
    np.testing.assert_array_equal(m["indices"], [[0, 1, 2], [0, 2, 3]])


def test_mesh_heavy_scene():
    # Scaled-down config-4 scene (the full 1M-tri variant builds in ~45s;
    # tested at 50k to keep CI fast — same code path).
    from trace_tpu.models.mesh_heavy import build_scene

    scene = build_scene(target_tris=50_000)
    assert scene.n_triangles > 45_000
    assert scene.accel is not None
    o = jnp.asarray([[0.0, 50.0, 0.0], [0.0, 50.0, 100.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]])
    hit = scene.intersect(o, d, jnp.full(2, jnp.inf))
    assert bool(hit.valid[0])      # over the terrain
    assert not bool(hit.valid[1])  # off the edge


def test_bvh_refit_native_matches_rebuild_bounds():
    from trace_tpu.accel.bvh import build_bvh, refit_bvh
    from trace_tpu.shapes import triangle as tri_mod
    from trace_tpu.core import transform as T

    rng = np.random.default_rng(11)
    nt = 500
    c = rng.uniform(-5, 5, (nt, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.5, (nt, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.5, (nt, 3)).astype(np.float32)
    verts = np.concatenate([c, c + e1, c + e2], 0)
    idx = np.stack([np.arange(nt), np.arange(nt) + nt, np.arange(nt) + 2 * nt], -1)
    tris = tri_mod.pack_triangle_mesh(T.identity(), idx, verts)
    bounds = tri_mod.world_bounds_np(tris)
    bvh = build_bvh(bounds, 4)

    # Move the geometry, refit, and check every node bound contains its
    # subtree's primitive bounds.
    shift = np.array([1.5, -2.0, 0.5], np.float32)
    moved = bounds + shift
    refit = refit_bvh(bvh, moved)
    lo = np.asarray(refit.lo)
    hi = np.asarray(refit.hi)
    np.testing.assert_allclose(lo[0], moved[:, 0].min(0), atol=1e-5)
    np.testing.assert_allclose(hi[0], moved[:, 1].max(0), atol=1e-5)
    # Leaves exactly bound their primitives.
    n_prims = np.asarray(bvh.n_prims)
    start = np.asarray(bvh.prim_start)
    order = np.asarray(bvh.prim_order)
    for node in np.flatnonzero(n_prims > 0)[:50]:
        ids = order[start[node]:start[node] + n_prims[node]]
        np.testing.assert_allclose(lo[node], moved[ids, 0].min(0), atol=1e-5)
        np.testing.assert_allclose(hi[node], moved[ids, 1].max(0), atol=1e-5)


def test_stale_native_library_falls_back_to_numpy(tmp_path, monkeypatch):
    """A loadable .so missing newer symbols (stale build artifact with a
    preserved mtime) must make native.load() return None — the promised
    NumPy-fallback path — not leak an AttributeError out of binding."""
    import subprocess
    import sys

    import trace_tpu.native as native

    src = tmp_path / "stale.cpp"
    src.write_text('extern "C" long bvh_build() { return 0; }\n')
    so = tmp_path / "stale.so"
    try:
        subprocess.run(
            ["g++", "-shared", "-fPIC", "-o", str(so), str(src)],
            check=True, capture_output=True, timeout=60,
        )
    except Exception:
        pytest.skip("no g++ available")
    monkeypatch.setattr(native, "_build_library", lambda: str(so))
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load_attempted", False)
    assert native.load() is None
    # Cached-negative thereafter.
    assert native.load() is None


def _ply_header(fmt, nv, nf, extra_vprops=""):
    return (
        "ply\nformat {} 1.0\n"
        "element vertex {}\nproperty float x\nproperty float y\nproperty float z\n"
        "{}"
        "element face {}\nproperty list uchar int vertex_indices\nend_header\n"
    ).format(fmt, nv, extra_vprops, nf).encode("ascii")


def test_ply_binary_big_endian_quads(tmp_path):
    # Fixed-arity quad faces through the binary fast path: fan
    # triangulation must split each quad into two triangles.
    path = tmp_path / "quads_be.ply"
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [2, 0, 0], [2, 1, 0]], np.float32)
    body = verts.astype(">f4").tobytes()
    for quad in ([0, 1, 2, 3], [1, 4, 5, 2]):
        body += np.uint8(4).tobytes() + np.asarray(quad, ">i4").tobytes()
    path.write_bytes(_ply_header("binary_big_endian", 6, 2) + body)
    from trace_tpu.io.ply import load_ply

    m = load_ply(str(path))
    np.testing.assert_allclose(m["vertices"], verts)
    np.testing.assert_array_equal(
        m["indices"],
        [[0, 1, 2], [0, 2, 3], [1, 4, 5], [1, 5, 2]],
    )


def test_ply_binary_ragged_faces(tmp_path):
    # Mixed tri/quad counts force the ragged slow path.
    path = tmp_path / "ragged_le.ply"
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [2, 0, 0]], np.float32)
    body = verts.astype("<f4").tobytes()
    body += np.uint8(4).tobytes() + np.asarray([0, 1, 2, 3], "<i4").tobytes()
    body += np.uint8(3).tobytes() + np.asarray([1, 4, 2], "<i4").tobytes()
    path.write_bytes(_ply_header("binary_little_endian", 5, 2) + body)
    from trace_tpu.io.ply import load_ply

    m = load_ply(str(path))
    np.testing.assert_array_equal(
        m["indices"], [[0, 1, 2], [0, 2, 3], [1, 4, 2]]
    )
