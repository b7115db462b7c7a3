"""Wavefront BVH traversal: batched per-ray short-stack walk in pure XLA.

Built as §7e's recorded follow-on (per-ray data-dependent work instead
of the sweeps' dense per-(ray, entered-super) testing) — and measured
SLOWER than the Pallas sweep on TPU at mesh scale: 886 vs 51.4 ms per
16384 full-raster rays at 1M tris, because each of the walk's ~361
sequential steps costs a ~2.45 ms row-gather floor (full analysis and
probe-methodology lessons: ARCHITECTURE.md §7f). It stays in the tree
as the portable per-ray-economy reference implementation and oracle —
the TPU default remains the sweep.

The reference's walk is a per-ray 64-entry stack loop
(/root/reference/src/accel/bvh.jl:212-299); this module runs that walk
for a whole ray batch per `lax.while_loop` step, built strictly on the
round-5 planar layout rules (§7c):

- all per-lane state is flat ``[N]`` component arrays (full-occupancy
  1-D fusions) — never ``[N, 3]``;
- every data-dependent load is ONE row-matrix gather: nodes live in an
  ``[M, 8]`` f32 matrix (bounds + bitcast int links), leaf triangles in
  a leaf-ordered ``[T, 12]`` matrix (vertices + bitcast original id), so
  each step does one node-row gather and ``max_leaf`` triangle-row
  gathers regardless of lane divergence;
- the per-lane stack is an ``[N, D]`` int32 matrix pushed/popped with
  masked iota broadcasts (pure VPU) instead of per-lane scatters.

Front-to-back ordering by per-axis direction sign and the any-hit
early-out match bvh.jl:242-299. The walk reuses the host SAH build
(accel/bvh.py — bvh.jl:87-206 layout) and the planar watertight test
(wavefront/geom._watertight — triangle_mesh.jl:158-243 semantics), so
closest-hit winners agree with the brute-force oracle path.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..shapes import sphere as sph_mod
from ..shapes import triangle as tri_mod
from ..wavefront.geom import _watertight
from ..core.vec import V3
from .bvh import build_bvh, LinearBVH
from .clusters import _sort_key

F32 = jnp.float32
I32 = jnp.int32


def pack_nodes(bvh: LinearBVH) -> np.ndarray:
    """Host [M, 8] node row matrix.

    cols 0-2 lo, 3-5 hi, col 6 = link (leaf: start into the LEAF-ORDERED
    triangle matrix; interior: right-child index), col 7 = meta
    ``(n_prims << 2) | axis`` — both int32 bitcast to f32 so the per-step
    load is one f32 row gather.
    """
    lo = np.asarray(bvh.lo, np.float32)
    hi = np.asarray(bvh.hi, np.float32)
    m = lo.shape[0]
    right = np.asarray(bvh.right_child, np.int32)
    start = np.asarray(bvh.prim_start, np.int32)
    count = np.asarray(bvh.n_prims, np.int32)
    axis = np.asarray(bvh.axis, np.int32)
    out = np.zeros((m, 8), np.float32)
    out[:, 0:3] = lo
    out[:, 3:6] = hi
    link = np.where(count > 0, start, right).astype(np.int32)
    meta = ((count << 2) | axis).astype(np.int32)
    out[:, 6] = link.view(np.float32)
    out[:, 7] = meta.view(np.float32)
    return out


def pack_leaf_tris(tris, order: np.ndarray) -> np.ndarray:
    """Host [T, 12] leaf-ordered triangle rows: v0 v1 v2 + original id
    (bitcast) + pad. Leaf prims are contiguous (prim_start..+n_prims), so
    the leaf scan is ``max_leaf`` clamped consecutive row gathers."""
    v0 = np.asarray(tris.v0, np.float32)[order]
    v1 = np.asarray(tris.v1, np.float32)[order]
    v2 = np.asarray(tris.v2, np.float32)[order]
    t = order.shape[0]
    out = np.zeros((max(t, 1), 12), np.float32)
    if t:
        out[:, 0:3] = v0
        out[:, 3:6] = v1
        out[:, 6:9] = v2
        out[:, 9] = np.asarray(order, np.int32).view(np.float32)
    return out


def tree_depth(bvh: LinearBVH) -> int:
    """Max interior depth, by vectorized BFS over the flattened layout
    (first child = i+1, second = right_child). Used to size the per-lane
    stack so a deep SAH split can never silently overflow it."""
    count = np.asarray(bvh.n_prims, np.int64)
    right = np.asarray(bvh.right_child, np.int64)
    frontier = np.array([0], np.int64)
    depth = 0
    while frontier.size:
        interior = frontier[count[frontier] == 0]
        if interior.size == 0:
            break
        frontier = np.concatenate([interior + 1, right[interior]])
        depth += 1
    return depth


def _select_axis(axis, vx, vy, vz):
    """Per-lane component select by split axis (arithmetic where-chain —
    no 3-wide gathers, per wavefront/geom.perm3's measured rule)."""
    return jnp.where(axis == 0, vx, jnp.where(axis == 1, vy, vz))


def traverse_batch(nodes_mat, tris_mat, o, d, t_max, *, max_leaf: int,
                   stack_depth: int = 48, any_hit: bool = False,
                   return_steps: bool = False):
    """Walk the BVH for a batch of rays. o/d are packed [N, 3] (the
    accelerator interface); all internal state is planar.

    Returns (hit [N], t [N], original-triangle-id [N]); with
    ``return_steps`` also the loop's step count (== the batch's WORST
    lane path length — the whole batch pays it, which is why callers
    coherence-sort and chunk).
    """
    nodes_mat = jnp.asarray(nodes_mat)
    tris_mat = jnp.asarray(tris_mat)
    n = o.shape[0]
    n_tri = tris_mat.shape[0]
    ov = V3.of(o)
    dv = V3.of(d)
    # Slab-test reciprocals (bounds.jl:180-200): IEEE inf for d == 0;
    # NaN from (lo - o) * inf when o is on the slab is healed below.
    idx_ = 1.0 / dv.x
    idy_ = 1.0 / dv.y
    idz_ = 1.0 / dv.z
    negx = idx_ < 0.0
    negy = idy_ < 0.0
    negz = idz_ < 0.0

    iota_d = jax.lax.iota(I32, stack_depth)[None, :]

    def slab(lox, loy, loz, hix, hiy, hiz, limit):
        def axis_near_far(lo_c, hi_c, o_c, inv_c):
            a = (lo_c - o_c) * inv_c
            b = (hi_c - o_c) * inv_c
            near = jnp.minimum(a, b)
            far = jnp.maximum(a, b)
            near = jnp.where(jnp.isnan(near), -jnp.inf, near)
            far = jnp.where(jnp.isnan(far), jnp.inf, far)
            return near, far

        nx, fx = axis_near_far(lox, hix, ov.x, idx_)
        ny, fy = axis_near_far(loy, hiy, ov.y, idy_)
        nz, fz = axis_near_far(loz, hiz, ov.z, idz_)
        tn = jnp.maximum(jnp.maximum(nx, ny), nz)
        tf = jnp.minimum(jnp.minimum(fx, fy), fz) * np.float32(1.00000024)
        return (tn <= tf) & (tf > 0.0) & (tn < limit)

    def cond(carry):
        cur = carry[0]
        return jnp.any(cur >= 0)

    def body(carry):
        cur, sp, stack, best_t, best_i, steps = carry
        live = cur >= 0
        rows = nodes_mat[jnp.maximum(cur, 0)]          # [N, 8] row gather
        link = jax.lax.bitcast_convert_type(rows[:, 6], I32)
        meta = jax.lax.bitcast_convert_type(rows[:, 7], I32)
        nprim = meta >> 2
        axis = meta & 3
        box = live & slab(rows[:, 0], rows[:, 1], rows[:, 2],
                          rows[:, 3], rows[:, 4], rows[:, 5], best_t)
        is_leaf = nprim > 0
        do_leaf = box & is_leaf

        bt, bi = best_t, best_i
        for k in range(max_leaf):
            tr = tris_mat[jnp.minimum(link + k, n_tri - 1)]  # [N, 12]
            v0 = V3(tr[:, 0], tr[:, 1], tr[:, 2])
            v1 = V3(tr[:, 3], tr[:, 4], tr[:, 5])
            v2 = V3(tr[:, 6], tr[:, 7], tr[:, 8])
            h, t, _, _, _ = _watertight(v0, v1, v2, ov, dv, bt)
            # Strict < : the first-visited (front-to-back nearer) winner
            # survives t-ties, matching the stage-sweep tie policy.
            better = do_leaf & (k < nprim) & h & (t < bt)
            bt = jnp.where(better, t, bt)
            bi = jnp.where(
                better, jax.lax.bitcast_convert_type(tr[:, 9], I32), bi
            )

        # Interior: descend the near child (direction-signed, bvh.jl:242),
        # push the far child on the per-lane stack.
        neg_axis = _select_axis(axis, negx, negy, negz)
        first = cur + 1
        near = jnp.where(neg_axis, link, first)
        far = jnp.where(neg_axis, first, link)
        descend = box & ~is_leaf
        push = descend & (sp < stack_depth)   # overflow drops (bvh.jl cap)
        spc = jnp.minimum(sp, stack_depth - 1)
        stack = jnp.where(
            (push[:, None]) & (iota_d == spc[:, None]), far[:, None], stack
        )
        sp2 = jnp.where(push, sp + 1, sp)

        # Next node: near child, else pop (or retire the lane).
        pop_sp = jnp.maximum(sp2 - 1, 0)
        popped = jnp.sum(
            jnp.where(iota_d == pop_sp[:, None], stack, 0), axis=1
        )
        popped = jnp.where(sp2 > 0, popped, -1)
        nxt = jnp.where(descend, near, popped)
        sp3 = jnp.where(descend, sp2, pop_sp)
        if any_hit:
            nxt = jnp.where(bi >= 0, -1, nxt)
        nxt = jnp.where(live, nxt, -1)
        return (nxt, sp3, stack, bt, bi, steps + 1)

    init = (
        jnp.zeros((n,), I32),                 # cur = root
        jnp.zeros((n,), I32),                 # sp
        jnp.zeros((n, stack_depth), I32),     # stack
        jnp.asarray(t_max, F32),              # best_t (prunes at t_max)
        jnp.full((n,), -1, I32),              # best_i
        jnp.zeros((), I32),                   # step counter
    )
    _, _, _, best_t, best_i, steps = jax.lax.while_loop(cond, body, init)
    hit = best_i >= 0
    out = (hit, jnp.where(hit, best_t, jnp.inf), jnp.maximum(best_i, 0))
    return out + (steps,) if return_steps else out


class WBVHAccelerator:
    """Scene accelerator: wavefront BVH walk for triangles + brute-force
    spheres (same interface as clusters.ClusterAccelerator). Multi-chunk
    batches are coherence-sorted (octant+Morton key) so each chunk's
    while_loop retires near its mean path length, not its max."""

    def __init__(self, nodes_mat: np.ndarray, tris_mat: np.ndarray,
                 max_leaf: int, stack_depth: int = 48,
                 ray_chunk: int = 16384, sort_rays: bool = True):
        self.nodes_mat = nodes_mat
        self.tris_mat = tris_mat
        self.max_leaf = int(max_leaf)
        self.stack_depth = int(stack_depth)
        self.ray_chunk = int(ray_chunk)
        self.sort_rays = bool(sort_rays)
        lo = np.asarray(nodes_mat[0, 0:3])
        hi = np.asarray(nodes_mat[0, 3:6])
        self._world_lo = lo
        self._world_inv_extent = (
            1.0 / np.maximum(hi - lo, 1e-12)
        ).astype(np.float32)

    def _chunked(self, o, d, t_max, any_hit):
        n = o.shape[0]
        run = lambda oo, dd, tt: traverse_batch(
            self.nodes_mat, self.tris_mat, oo, dd, tt,
            max_leaf=self.max_leaf, stack_depth=self.stack_depth,
            any_hit=any_hit,
        )
        if n <= self.ray_chunk and not (self.sort_rays
                                        and n > self.ray_chunk // 2):
            return run(o, d, t_max)
        order = None
        if self.sort_rays:
            key = _sort_key(o, d, jnp.asarray(self._world_lo),
                            jnp.asarray(self._world_inv_extent))
            order = jnp.argsort(key)
            o, d, t_max = o[order], d[order], t_max[order]
        outs = []
        for s in range(0, n, self.ray_chunk):
            e = min(s + self.ray_chunk, n)
            outs.append(run(o[s:e], d[s:e], t_max[s:e]))
        hit, t, idx = (jnp.concatenate(x, axis=0) for x in zip(*outs))
        if order is not None:
            inv = jnp.zeros_like(order).at[order].set(
                jnp.arange(n, dtype=order.dtype)
            )
            hit, t, idx = hit[inv], t[inv], idx[inv]
        return hit, t, idx

    def closest(self, scene, o, d, t_max):
        n = o.shape[0]
        no_hit = (jnp.zeros(n, bool), jnp.full(n, jnp.inf, F32),
                  jnp.zeros(n, jnp.int32))
        hs = (
            sph_mod.intersect_closest(scene.spheres, o, d, t_max)
            if scene.n_spheres else no_hit
        )
        ht = (
            self._chunked(o, d, t_max, False)
            if scene.n_triangles else no_hit
        )
        return hs, ht

    def any_hit(self, scene, o, d, t_max):
        n = o.shape[0]
        occ = jnp.zeros(n, bool)
        if scene.n_spheres:
            occ = occ | sph_mod.intersect_p(scene.spheres, o, d, t_max)
        if scene.n_triangles:
            h, t, _ = self._chunked(o, d, t_max, True)
            occ = occ | (h & (t <= t_max))
        return occ


def attach(scene, max_prims_per_leaf: int = 4, stack_depth: int = 48,
           ray_chunk: int = 16384):
    """Build the wavefront-BVH accelerator for the scene and install it."""
    if scene.n_triangles == 0:
        return scene
    tris = getattr(scene, "triangles_host", scene.triangles)
    bounds = tri_mod.world_bounds_np(tris)
    bvh = build_bvh(bounds, max_prims_per_leaf)
    nodes_mat = pack_nodes(bvh)
    tris_mat = pack_leaf_tris(tris, np.asarray(bvh.prim_order, np.int64))
    # Only far children are pushed, so max residency == interior depth;
    # +2 slack. A too-small user value is corrected, never truncated.
    stack_depth = max(stack_depth, tree_depth(bvh) + 2)
    scene.bump_version()
    scene.accel = WBVHAccelerator(
        nodes_mat, tris_mat, max_prims_per_leaf, stack_depth, ray_chunk
    )
    return scene
