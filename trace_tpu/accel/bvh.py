"""Bounding-volume hierarchy: host-side SAH build + on-device traversal.

TPU-native counterpart of /root/reference/src/accel/bvh.jl. The build
mirrors the reference's 12-bucket SAH recursion over primitive world bounds
(bvh.jl:87-185) and emits the same flattened depth-first layout
(LinearBVH, bvh.jl:37-48, second_child_offset). Traversal replaces the
per-ray 64-entry stack loop (bvh.jl:212-299) with a vmapped
``lax.while_loop`` + fixed stack per lane — front-to-back ordering by the
per-axis direction sign, early-out any-hit variant for shadow rays.

The BVH indexes the scene's packed Triangles; spheres (few per scene) stay
on the brute-force path. ``attach(scene)`` installs the accelerator.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.pytree import pytree
from ..shapes import sphere as sph_mod
from ..shapes import triangle as tri_mod

F32 = jnp.float32
STACK_DEPTH = 64
N_BUCKETS = 12


@pytree
class LinearBVH:
    lo: jnp.ndarray           # [M, 3]
    hi: jnp.ndarray           # [M, 3]
    right_child: jnp.ndarray  # [M] int32 (second child index; first = i+1)
    prim_start: jnp.ndarray   # [M] int32 offset into prim_order
    n_prims: jnp.ndarray      # [M] int32 (0 -> interior)
    axis: jnp.ndarray         # [M] int32 split axis
    prim_order: jnp.ndarray   # [T] int32 leaf-ordered primitive ids


def build_bvh(bounds: np.ndarray, max_prims_per_leaf: int = 4,
              native: bool = True) -> LinearBVH:
    """SAH build over primitive AABBs [T, 2, 3] (bvh.jl:87-206).

    Uses the C++ builder (trace_tpu/native/bvh_builder.cpp — same algorithm
    and layout) when available; the NumPy path below is the fallback and
    the test oracle. Median split for tiny ranges, bucketed SAH otherwise;
    explicit stack so 1M-primitive builds don't blow Python's stack.
    """
    if native and bounds.shape[0] > 0:
        built = _build_bvh_native(bounds, max_prims_per_leaf)
        if built is not None:
            return built
    return _build_bvh_numpy(bounds, max_prims_per_leaf)


def _build_bvh_native(bounds: np.ndarray, max_prims_per_leaf: int):
    import ctypes

    from ..native import load

    lib = load()
    if lib is None:
        return None
    t_count = bounds.shape[0]
    cap = max(2 * t_count, 16)
    b = np.ascontiguousarray(bounds, np.float32)
    n_lo = np.empty((cap, 3), np.float32)
    n_hi = np.empty((cap, 3), np.float32)
    right = np.empty(cap, np.int32)
    start = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    axis = np.empty(cap, np.int32)
    order = np.empty(t_count, np.int32)
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    n_nodes = lib.bvh_build(
        fp(b), t_count, max_prims_per_leaf, cap,
        fp(n_lo), fp(n_hi), ip(right), ip(start), ip(count), ip(axis),
        ip(order),
    )
    if n_nodes < 0:
        return None
    return LinearBVH(
        n_lo[:n_nodes], n_hi[:n_nodes],
        right[:n_nodes], start[:n_nodes],
        count[:n_nodes], axis[:n_nodes],
        order,
    )


def _build_bvh_numpy(bounds: np.ndarray, max_prims_per_leaf: int = 4) -> LinearBVH:
    t_count = bounds.shape[0]
    lo_all = bounds[:, 0]
    hi_all = bounds[:, 1]
    centroids = 0.5 * (lo_all + hi_all)

    # Node arrays, grown geometrically.
    cap = max(2 * t_count, 16)
    n_lo = np.zeros((cap, 3), np.float32)
    n_hi = np.zeros((cap, 3), np.float32)
    n_right = np.full(cap, -1, np.int32)
    n_start = np.zeros(cap, np.int32)
    n_count = np.zeros(cap, np.int32)
    n_axis = np.zeros(cap, np.int32)
    order = np.arange(t_count, dtype=np.int32)
    n_nodes = 0

    def alloc():
        nonlocal n_nodes, cap, n_lo, n_hi, n_right, n_start, n_count, n_axis
        if n_nodes >= cap:
            cap *= 2
            n_lo = np.resize(n_lo, (cap, 3))
            n_hi = np.resize(n_hi, (cap, 3))
            n_right = np.resize(n_right, cap)
            n_start = np.resize(n_start, cap)
            n_count = np.resize(n_count, cap)
            n_axis = np.resize(n_axis, cap)
        i = n_nodes
        n_nodes += 1
        return i

    # Work stack of (range_start, range_end, parent_slot, is_second_child).
    # Depth-first with the first child processed immediately after its
    # parent reproduces the reference's flattened layout (bvh.jl:187-206).
    stack = [(0, t_count, -1, False)]
    while stack:
        start, end, parent, is_second = stack.pop()
        node = alloc()
        if parent >= 0 and is_second:
            n_right[parent] = node
        ids = order[start:end]
        blo = lo_all[ids].min(0)
        bhi = hi_all[ids].max(0)
        n_lo[node] = blo
        n_hi[node] = bhi
        count = end - start

        def make_leaf():
            n_start[node] = start
            n_count[node] = count

        if count <= 1:
            make_leaf()
            continue

        cent = centroids[ids]
        c_lo, c_hi = cent.min(0), cent.max(0)
        diag = c_hi - c_lo
        axis = int(np.argmax(diag))
        n_axis[node] = axis
        if diag[axis] < 1e-12:
            make_leaf()
            continue

        if count <= 2:
            # Median split (bvh.jl:118-126).
            key = np.argsort(cent[:, axis], kind="stable")
            order[start:end] = ids[key]
            mid = start + count // 2
        else:
            # Bucketed SAH (bvh.jl:129-165).
            rel = (cent[:, axis] - c_lo[axis]) / diag[axis]
            b = np.minimum((rel * N_BUCKETS).astype(np.int32), N_BUCKETS - 1)
            costs = np.full(N_BUCKETS - 1, np.inf, np.float64)
            for split in range(N_BUCKETS - 1):
                left = b <= split
                nl = int(left.sum())
                nr = count - nl
                if nl == 0 or nr == 0:
                    continue
                llo = lo_all[ids[left]].min(0); lhi = hi_all[ids[left]].max(0)
                rlo = lo_all[ids[~left]].min(0); rhi = hi_all[ids[~left]].max(0)
                sa = lambda l, h: 2.0 * (
                    (h - l)[0] * (h - l)[1] + (h - l)[1] * (h - l)[2]
                    + (h - l)[0] * (h - l)[2]
                )
                total_sa = max(sa(blo, bhi), 1e-20)
                costs[split] = 1.0 + (nl * sa(llo, lhi) + nr * sa(rlo, rhi)) / total_sa
            best = int(np.argmin(costs))
            leaf_cost = float(count)
            if count <= max_prims_per_leaf and costs[best] >= leaf_cost:
                make_leaf()
                continue
            left_mask = b <= best
            if not left_mask.any() or left_mask.all():
                make_leaf()
                continue
            order[start:end] = np.concatenate([ids[left_mask], ids[~left_mask]])
            mid = start + int(left_mask.sum())

        # Push second child first so the first child is processed next
        # (depth-first first-child-adjacent layout).
        stack.append((mid, end, node, True))
        stack.append((start, mid, node, False))

    return LinearBVH(
        n_lo[:n_nodes], n_hi[:n_nodes],
        n_right[:n_nodes], n_start[:n_nodes],
        n_count[:n_nodes], n_axis[:n_nodes],
        order,
    )


def refit_bvh(bvh: LinearBVH, bounds: np.ndarray) -> LinearBVH:
    """Refresh node bounds for animated geometry with fixed topology
    (BASELINE.json config 5): one bottom-up sweep, native when available.
    The depth-first first-child-adjacent layout guarantees children have
    larger indices than parents, so a reverse sweep suffices."""
    n_nodes = bvh.lo.shape[0]
    lo = np.ascontiguousarray(np.asarray(bvh.lo))
    hi = np.ascontiguousarray(np.asarray(bvh.hi))
    right = np.ascontiguousarray(np.asarray(bvh.right_child))
    start = np.ascontiguousarray(np.asarray(bvh.prim_start))
    count = np.ascontiguousarray(np.asarray(bvh.n_prims))
    order = np.ascontiguousarray(np.asarray(bvh.prim_order))
    b = np.ascontiguousarray(bounds, np.float32)

    from ..native import load

    lib = load()
    if lib is not None:
        import ctypes

        fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        lib.bvh_refit(fp(b), bounds.shape[0], n_nodes, fp(lo), fp(hi),
                      ip(right), ip(start), ip(count), ip(order))
    else:
        for node in range(n_nodes - 1, -1, -1):
            if count[node] > 0:
                ids = order[start[node]:start[node] + count[node]]
                lo[node] = b[ids, 0].min(0)
                hi[node] = b[ids, 1].max(0)
            else:
                c0, c1 = node + 1, right[node]
                lo[node] = np.minimum(lo[c0], lo[c1])
                hi[node] = np.maximum(hi[c0], hi[c1])
    import dataclasses

    return dataclasses.replace(
        bvh, lo=jnp.asarray(lo), hi=jnp.asarray(hi)
    )


# ---------------------------------------------------------------------------
# Traversal
# ---------------------------------------------------------------------------


def _slab_hit(lo, hi, o, inv_d, t_max):
    """Precomputed-reciprocal slab test (bounds.jl:180-200 semantics)."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    near = jnp.minimum(t0, t1)
    far = jnp.maximum(t0, t1)
    # NaN from 0 * inf: treat as pass-through on that axis.
    near = jnp.where(jnp.isnan(near), -jnp.inf, near)
    far = jnp.where(jnp.isnan(far), jnp.inf, far)
    tn = jnp.max(near)
    tf = jnp.min(far) * 1.00000024  # PBRT gamma(3)-style robustness pad
    return (tn <= tf) & (tf > 0.0) & (tn < t_max)


def _tri_hit_t(tris: tri_mod.Triangles, pid, o, d):
    """Single-primitive watertight test for one ray; returns (hit, t)."""
    v0 = tris.v0[pid]
    v1 = tris.v1[pid]
    v2 = tris.v2[pid]
    hit, t, _, _, _ = tri_mod._intersect_core(
        v0, v1, v2, o, d, jnp.asarray(jnp.inf, F32)
    )
    return hit, t


def _traverse_one(bvh: LinearBVH, tris, o, d, t_max, max_leaf: int,
                  any_hit: bool):
    """Closest-hit (or early-out any-hit) traversal for ONE ray
    (bvh.jl:212-299). vmapped over the ray batch by the callers."""
    # Leaves may be host numpy (scene build keeps geometry on host);
    # promote so traced-index gathers below work.
    tris = jax.tree.map(jnp.asarray, tris)
    bvh = jax.tree.map(jnp.asarray, bvh)
    inv_d = 1.0 / d
    neg = (inv_d < 0.0).astype(jnp.int32)  # per-axis direction sign

    stack = jnp.zeros((STACK_DEPTH,), jnp.int32)

    def cond(carry):
        current, sp, stack, best_t, best_i, done = carry
        return (current >= 0) & ~done

    def body(carry):
        current, sp, stack, best_t, best_i, done = carry
        lo = bvh.lo[current]
        hi = bvh.hi[current]
        box = _slab_hit(lo, hi, o, inv_d, best_t)
        nprim = bvh.n_prims[current]
        is_leaf = nprim > 0

        # Leaf: test up to max_leaf primitives.
        def leaf_scan(k, acc):
            bt, bi = acc
            valid = k < nprim
            pid = bvh.prim_order[
                jnp.minimum(bvh.prim_start[current] + k,
                            bvh.prim_order.shape[0] - 1)
            ]
            h, t = _tri_hit_t(tris, pid, o, d)
            better = valid & h & (t < bt) & (t <= t_max)
            return (jnp.where(better, t, bt), jnp.where(better, pid, bi))

        do_leaf = box & is_leaf
        best_t2, best_i2 = jax.lax.cond(
            do_leaf,
            lambda: jax.lax.fori_loop(0, max_leaf, leaf_scan, (best_t, best_i)),
            lambda: (best_t, best_i),
        )
        if any_hit:
            done = done | (best_i2 >= 0)

        # Interior: descend near child, push far child.
        axis = bvh.axis[current]
        second_first = neg[axis] == 1
        near = jnp.where(second_first, bvh.right_child[current], current + 1)
        far = jnp.where(second_first, current + 1, bvh.right_child[current])
        descend = box & ~is_leaf

        push = descend & (sp < STACK_DEPTH)
        stack = stack.at[jnp.minimum(sp, STACK_DEPTH - 1)].set(
            jnp.where(push, far, stack[jnp.minimum(sp, STACK_DEPTH - 1)])
        )
        sp2 = jnp.where(push, sp + 1, sp)

        # Next node: near child, else pop.
        pop_sp = jnp.maximum(sp2 - 1, 0)
        popped = jnp.where(sp2 > 0, stack[pop_sp], -1)
        current2 = jnp.where(descend, near, popped)
        sp3 = jnp.where(descend, sp2, pop_sp)
        return (current2, sp3, stack, best_t2, best_i2, done)

    init = (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), stack,
            t_max, jnp.asarray(-1, jnp.int32), jnp.asarray(False))
    _, _, _, best_t, best_i, _ = jax.lax.while_loop(cond, body, init)
    hit = best_i >= 0
    return hit, jnp.where(hit, best_t, jnp.inf), jnp.maximum(best_i, 0)


class BVHAccelerator:
    """Scene accelerator: triangle BVH + brute-force spheres."""

    def __init__(self, bvh: LinearBVH, max_leaf: int):
        self.bvh = bvh
        self.max_leaf = int(max_leaf)

    def closest(self, scene, o, d, t_max):
        n = o.shape[0]
        no_hit = (jnp.zeros(n, bool), jnp.full(n, jnp.inf, F32),
                  jnp.zeros(n, jnp.int32))
        if scene.n_spheres:
            hs = sph_mod.intersect_closest(scene.spheres, o, d, t_max)
        else:
            hs = no_hit
        if scene.n_triangles:
            tris = jax.tree.map(jnp.asarray, scene.triangles)
            ht = jax.vmap(
                lambda oo, dd, tt: _traverse_one(
                    self.bvh, tris, oo, dd, tt,
                    self.max_leaf, any_hit=False,
                )
            )(o, d, t_max)
        else:
            ht = no_hit
        return hs, ht

    def any_hit(self, scene, o, d, t_max):
        n = o.shape[0]
        occ = jnp.zeros(n, bool)
        if scene.n_spheres:
            occ = occ | sph_mod.intersect_p(scene.spheres, o, d, t_max)
        if scene.n_triangles:
            tris = jax.tree.map(jnp.asarray, scene.triangles)
            h, t, _ = jax.vmap(
                lambda oo, dd, tt: _traverse_one(
                    self.bvh, tris, oo, dd, tt,
                    self.max_leaf, any_hit=True,
                )
            )(o, d, t_max)
            occ = occ | (h & (t <= t_max))
        return occ


def attach(scene, max_prims_per_leaf: int = 4):
    """Build a triangle BVH for the scene and install it."""
    if scene.n_triangles == 0:
        return scene
    bounds = tri_mod.world_bounds_np(
        getattr(scene, "triangles_host", scene.triangles))
    bvh = build_bvh(bounds, max_prims_per_leaf)
    scene.bump_version()
    scene.accel = BVHAccelerator(bvh, max_prims_per_leaf)
    return scene
