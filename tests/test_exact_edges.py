"""Shared-edge no-leak guarantee on the ACCELERATED hot paths.

The reference's triangle test is watertight with an f64 edge-function
fallback on every render (triangle_mesh.jl:99-123, 194-197): a ray
crossing the shared edge of two mesh triangles always hits one of them.
trace_tpu's sweep accelerators use the matmul-factored Moller-Trumbore
test, whose f32 boundary rounding is NOT paired between edge-adjacent
triangles — both can reject, leaking the ray. ``exact_shared_edges=True``
now composes with the accelerators via the certified-widened epilogue
(mxu.mt_epilogue_certified): every boundary test is relaxed by a proven
upper bound on its own rounding error, so at least one neighbor accepts.

These tests drive rays whose EXACT intersection lies on shared mesh edges
through the XLA cluster sweep and the Pallas sparse-sweep kernel
(interpret mode) and assert zero leaks end-to-end through scene.intersect.
"""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from trace_tpu.core import transform as T
from trace_tpu.lights import lights as L
from trace_tpu.materials.materials import MatteMaterial
from trace_tpu.scene import SceneBuilder
from trace_tpu.shapes import triangle as tri_mod

pytestmark = pytest.mark.slow  # compile-heavy: full-suite tier only


F32 = jnp.float32


def _grid(n=13, amp=0.25, seed=0):
    """Heightfield grid: (n-1)^2*2 triangles, every interior edge shared.
    Returns (idx, verts, shared_edges) with shared_edges a list of vertex
    index pairs (the quad diagonals — an edge shared by two triangles)."""
    rng = np.random.default_rng(seed)
    xs = np.linspace(-2.0, 2.0, n, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    gz = (amp * np.sin(2.1 * gx) * np.cos(1.7 * gy)
          + 0.05 * rng.normal(size=gx.shape)).astype(np.float32)
    verts = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
    ii, jj = np.meshgrid(np.arange(n - 1), np.arange(n - 1), indexing="ij")
    v00 = (ii * n + jj).reshape(-1)
    # Split each quad along the v00+1 -- v00+n diagonal: that edge is
    # shared by the two triangles of the quad.
    idx = np.concatenate(
        [np.stack([v00, v00 + n, v00 + 1], -1),
         np.stack([v00 + 1, v00 + n, v00 + n + 1], -1)], axis=0
    ).astype(np.uint32)
    shared = np.stack([v00 + 1, v00 + n], -1)
    return idx, verts, shared


def _edge_rays(verts, shared, per_edge=8, seed=1):
    """Rays whose exact intersection lies ON a shared edge: targets are
    f32 points va + s*(vb - va), origins generic above the surface."""
    rng = np.random.default_rng(seed)
    va = verts[shared[:, 0]]
    vb = verts[shared[:, 1]]
    s = rng.uniform(0.05, 0.95, (shared.shape[0], per_edge, 1)
                    ).astype(np.float32)
    p = va[:, None, :] + s * (vb - va)[:, None, :]    # [E, K, 3]
    p = p.reshape(-1, 3).astype(np.float32)
    o = p + np.stack(
        [rng.uniform(-0.8, 0.8, p.shape[0]),
         rng.uniform(-0.8, 0.8, p.shape[0]),
         rng.uniform(2.0, 4.0, p.shape[0])], -1,
    ).astype(np.float32)
    d = (p - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def _build(accelerator, exact):
    idx, verts, shared = _grid()
    b = SceneBuilder()
    mat = b.material(MatteMaterial())
    b.triangle_mesh(T.identity(), idx, verts, mat)
    b.light(L.point_light(T.translate([0.0, 0.0, 6.0]), (50.0,) * 3))
    scene = b.build(exact_shared_edges=exact, accelerator=accelerator)
    return scene, verts, shared


def _leaks(scene, o, d):
    n = o.shape[0]
    hit = jax.jit(
        lambda o, d: scene.intersect(o, d, jnp.full((n,), jnp.inf, F32))
    )(o, d)
    return int(np.sum(~np.asarray(hit.valid))), hit


def test_no_shared_edge_leak_cluster_sweep():
    scene, verts, shared = _build("clusters", exact=True)
    assert scene.accel is not None and scene.accel.certified
    o, d = _edge_rays(verts, shared)
    leaks, hit = _leaks(scene, o, d)
    assert leaks == 0, f"{leaks}/{o.shape[0]} shared-edge rays leaked"
    # Hits land on the targeted edge: |p - target| small.
    t = np.asarray(hit.t)
    assert np.isfinite(t).all() and (t > 0).all()


def test_no_shared_edge_leak_pallas_sweep():
    scene, verts, shared = _build("pallas_sweep", exact=True)
    assert scene.accel is not None and scene.accel.certified
    o, d = _edge_rays(verts, shared, seed=2)
    leaks, hit = _leaks(scene, o, d)
    assert leaks == 0, f"{leaks}/{o.shape[0]} shared-edge rays leaked"


def test_certified_epilogue_never_loses_oracle_hits():
    """Superset property on a generic soup: every hit the brute-force
    watertight oracle finds, the certified sweep finds too (possibly via
    the edge-adjacent neighbor), with matching t."""
    rng = np.random.default_rng(7)
    nt = 400
    c = rng.uniform(-4, 4, (nt, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.7, (nt, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.7, (nt, 3)).astype(np.float32)
    verts = np.concatenate([c, c + e1, c + e2], 0)
    idx = np.stack([np.arange(nt), np.arange(nt) + nt,
                    np.arange(nt) + 2 * nt], -1)
    tris = tri_mod.pack_triangle_mesh(T.identity(), idx, verts)

    nr = 400
    o = jnp.asarray(rng.uniform(-6, 6, (nr, 3)).astype(np.float32))
    dd = rng.normal(0, 1, (nr, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    d = jnp.asarray(dd)
    t_max = jnp.full(nr, jnp.inf)

    bh, bt = tri_mod.intersect_all(tris, o, d, t_max)
    bt = jnp.where(bh, bt, jnp.inf)
    oracle_hit = np.asarray(jnp.isfinite(jnp.min(bt, axis=-1)))
    oracle_t = np.asarray(jnp.min(bt, axis=-1))

    from trace_tpu.accel import clusters as CL
    accel = CL.build_clusters(tris, leaf_tris=16)
    h, t, _ = CL.traverse(accel, o, d, t_max, stage_clusters=32,
                          certified=True)
    h, t = np.asarray(h), np.asarray(t)
    assert (h | ~oracle_hit).all()     # superset: no oracle hit lost
    np.testing.assert_allclose(t[oracle_hit], oracle_t[oracle_hit],
                               rtol=2e-4, atol=2e-4)


def test_certified_render_finite_and_close_to_default():
    """End-to-end Whitted render with exact_shared_edges on the pallas
    sweep: finite, and within noise of the default-path render (the
    widening only moves boundary-measure-zero pixels)."""
    from trace_tpu.camera.perspective import PerspectiveCamera
    from trace_tpu.film.film import Film
    from trace_tpu.film.filters import LanczosSincFilter
    from trace_tpu.integrators.whitted import WhittedIntegrator
    from trace_tpu.sampler.uniform import UniformSampler

    def render(exact):
        scene, _, _ = _build("pallas_sweep", exact=exact)
        film = Film((24, 24), filter=LanczosSincFilter((1.0, 1.0), 3.0),
                    filename="/tmp/_edges.png")
        cam = PerspectiveCamera(
            T.look_at([0.0, -1.5, 4.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
            film=film, convention="pbrt",
        )
        st = WhittedIntegrator(cam, UniformSampler(1, seed=3),
                               max_depth=2).render(scene)
        return np.asarray(film.to_image(st))

    img_c = render(True)
    img_d = render(False)
    assert np.isfinite(img_c).all()
    assert img_c.max() > 0.01
    mse = float(np.mean((img_c - img_d) ** 2))
    assert mse < 1e-5, mse
