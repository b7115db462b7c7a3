"""Wavefront cluster traversal — the TPU-native acceleration structure.

The reference traverses a deep BVH with a per-ray 64-entry stack
(/root/reference/src/accel/bvh.jl:212-299). A vmapped translation of that
loop is hostile to TPUs: every step is a per-lane scalar gather, which XLA
lowers catastrophically (measured on v5e: a [65k rays x 88k tris] scene
fails to compile — gathers materialize [N, T, 3]); per-ray block gathers
run at ~5 GB/s effective. So traversal here avoids per-lane gathers
entirely (SURVEY.md §7's core kernel-engineering risk):

1. The SAH tree is cut into fixed-size leaf clusters; one fused [N, C]
   slab pass computes every ray's entry distance to every cluster.
2. Clusters are globally ordered by demand (how many rays enter them) and
   swept in stages; each stage tests h clusters' triangle blocks against
   the WHOLE ray batch with matmul-factored Moller-Trumbore on the MXU
   (_test_stage_mt; VPU watertight variant kept for parity tests).
3. A lane retires when the minimum entry distance over all unswept
   clusters (a precomputed suffix-min over the demand order) exceeds its
   best hit — the early-out guarantee of stack traversal with no per-lane
   control flow. Exact: worst case degrades to brute force, never to
   dropped hits.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.pytree import pytree
from ..shapes import sphere as sph_mod
from ..shapes import triangle as tri_mod
from .bvh import LinearBVH, build_bvh
from . import mxu as mxu_mod

F32 = jnp.float32


@pytree(static=("leaf_tris", "super_size"))
class ClusterAccel:
    """Triangle data is packed row-major per cluster so the per-round
    fetch is a contiguous-row gather (embedding-lookup shape) — TPU
    gathers of full rows are DMA-friendly, strided [C, L, 3] gathers are
    not (measured 30x difference).

    Two-level entry (round-2, VERDICT item 3): the per-ray entry table is
    computed over SUPER-clusters — unions of ``super_size`` consecutive
    clusters in the depth-first SAH-cut order (spatially local by
    construction) — shrinking the [N, C] table to [N, C/G]. A super's
    slab entry distance lower-bounds every member cluster's, so the
    demand order and the suffix-min early-out stay conservative: lanes
    never retire early, hits are never dropped."""

    c_lo: jnp.ndarray     # [C, 3]
    c_hi: jnp.ndarray     # [C, 3]
    s_lo: jnp.ndarray     # [S, 3] super-cluster AABBs (S = ceil(C/G))
    s_hi: jnp.ndarray     # [S, 3]
    packed: jnp.ndarray   # [C, P] f32; row = v0.flat | v1.flat | v2.flat
                          # (each L*3), padded to a multiple of 128
    packed_mt: jnp.ndarray  # [C, 16*L] f32; row = n|e1|e2|w|q (3L each)
                            # then v0n (L) — Moller-Trumbore matmul consts
    tri_id: jnp.ndarray   # [C, Lp] int32 global triangle id; -1 = padding
    leaf_tris: int
    super_size: int


def _subtree_ranges(bvh: LinearBVH):
    """Prim count + range start per node. The depth-first first-child-
    adjacent layout makes every subtree's primitives a contiguous range of
    prim_order."""
    n_prims = np.asarray(bvh.n_prims)
    right = np.asarray(bvh.right_child)
    start = np.asarray(bvh.prim_start)
    m_nodes = n_prims.shape[0]
    count = np.zeros(m_nodes, np.int64)
    for node in range(m_nodes - 1, -1, -1):
        if n_prims[node] > 0:
            count[node] = n_prims[node]
        else:
            count[node] = count[node + 1] + count[right[node]]
    range_start = np.zeros(m_nodes, np.int64)
    stack = [(0, 0)]
    while stack:
        node, s = stack.pop()
        range_start[node] = s
        if n_prims[node] == 0:
            stack.append((node + 1, s))
            stack.append((right[node], s + count[node + 1]))
        else:
            assert start[node] == s
    return count, range_start


def _cluster_cut(bvh: LinearBVH, leaf_tris: int):
    """Cut the tree at subtrees of <= leaf_tris prims -> (nodes, starts,
    counts), left-child-first depth-first order. Native (bvh_cluster_cut,
    trace_tpu/native/bvh_builder.cpp) when available — the two per-node
    Python loops below cost ~14 s at 1M triangles; the Python path stays
    as the fallback and the equality oracle (test_accel_equivalence)."""
    n_prims = np.ascontiguousarray(np.asarray(bvh.n_prims), np.int32)
    right = np.ascontiguousarray(np.asarray(bvh.right_child), np.int32)
    m_nodes = int(n_prims.shape[0])

    from ..native import load

    lib = load()
    if lib is not None and m_nodes > 0:
        import ctypes

        cap = m_nodes  # cut size is bounded by the node count
        nodes_arr = np.empty(cap, np.int32)
        starts_arr = np.empty(cap, np.int64)
        counts_arr = np.empty(cap, np.int64)
        ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        lp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        c = lib.bvh_cluster_cut(
            m_nodes, ip(right), ip(n_prims), leaf_tris, cap,
            ip(nodes_arr), lp(starts_arr), lp(counts_arr),
        )
        if c >= 0:
            return (nodes_arr[:c].astype(np.int64), starts_arr[:c],
                    counts_arr[:c])

    count, range_start = _subtree_ranges(bvh)
    clusters = []  # (node, start, count)
    stack = [0]
    while stack:
        node = stack.pop()
        if count[node] <= leaf_tris or n_prims[node] > 0:
            clusters.append((node, range_start[node], count[node]))
        else:
            stack.append(right[node])
            stack.append(node + 1)
    c = len(clusters)
    return (np.fromiter((cl[0] for cl in clusters), np.int64, c),
            np.fromiter((cl[1] for cl in clusters), np.int64, c),
            np.fromiter((cl[2] for cl in clusters), np.int64, c))


def _pack_blocks(v0, v1, v2, tri_id, leaf_tris: int,
                 want_bounds: bool = False):
    """Gather per-cluster vertex blocks + Moller-Trumbore matmul constants
    (see accel/mxu.py) -> (packed [C, 9l->%128], packed_mt [C, 16l->%128],
    lo, hi). Constants are computed in f64 and rounded once to f32.
    Native (cluster_pack, bvh_builder.cpp, built -ffp-contract=off so the
    roundings match) when available; the numpy path below is the fallback
    and the bit-equality oracle. Padding slots stay zero -> det = 0,
    never hit. lo/hi (per-cluster vertex AABBs, for refit) are only
    computed when want_bounds."""
    c = tri_id.shape[0]
    l = int(leaf_tris)
    p_stride = 9 * l + ((-9 * l) % 128)
    mt_stride = 16 * l + ((-16 * l) % 128)

    from ..native import load

    lib = load()
    if lib is not None and hasattr(lib, "cluster_pack"):
        import ctypes

        fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        v0c = np.ascontiguousarray(v0, np.float32)
        v1c = np.ascontiguousarray(v1, np.float32)
        v2c = np.ascontiguousarray(v2, np.float32)
        tid = np.ascontiguousarray(tri_id[:, :l], np.int32)
        packed = np.empty((c, p_stride), np.float32)
        packed_mt = np.empty((c, mt_stride), np.float32)
        if want_bounds:
            b_lo = np.empty((c, 3), np.float32)
            b_hi = np.empty((c, 3), np.float32)
            blp, bhp = fp(b_lo), fp(b_hi)
        else:
            b_lo = b_hi = None
            blp = bhp = ctypes.POINTER(ctypes.c_float)()
        lib.cluster_pack(fp(v0c), fp(v1c), fp(v2c), ip(tid), c, l,
                         p_stride, mt_stride, fp(packed), fp(packed_mt),
                         blp, bhp)
        return packed, packed_mt, b_lo, b_hi

    safe = np.maximum(tri_id[:, :l], 0)
    mask = tri_id[:, :l] >= 0
    blocks = lambda v: np.where(
        mask[..., None], v[safe], 0.0
    ).astype(np.float32)
    bl0, bl1, bl2 = blocks(v0), blocks(v1), blocks(v2)
    seg = l * 3
    packed = np.concatenate(
        [bl0.reshape(c, seg), bl1.reshape(c, seg), bl2.reshape(c, seg)],
        axis=1,
    )
    packed = np.pad(packed, ((0, 0), (0, p_stride - packed.shape[1])))
    b0 = bl0.astype(np.float64)
    e1 = bl1.astype(np.float64) - b0
    e2 = bl2.astype(np.float64) - b0
    nrm = np.cross(e1, e2)
    w = np.cross(e2, b0)
    q = np.cross(b0, e1)
    v0n = np.einsum("clj,clj->cl", b0, nrm)
    flat = lambda x: x.transpose(0, 2, 1).reshape(c, seg)
    packed_mt = np.concatenate(
        [flat(nrm), flat(e1), flat(e2), flat(w), flat(q), v0n], axis=1
    ).astype(np.float32)
    packed_mt = np.pad(
        packed_mt, ((0, 0), (0, mt_stride - packed_mt.shape[1]))
    )
    b_lo = b_hi = None
    if want_bounds:
        big = np.float32(3e38)
        mn = np.minimum(np.minimum(bl0, bl1), bl2)
        mx = np.maximum(np.maximum(bl0, bl1), bl2)
        b_lo = np.min(np.where(mask[..., None], mn, big), axis=1)
        b_hi = np.max(np.where(mask[..., None], mx, -big), axis=1)
    return packed, packed_mt, b_lo, b_hi


def _super_bounds(c_lo: np.ndarray, c_hi: np.ndarray, g: int):
    """Union AABBs of groups of g consecutive clusters (depth-first cut
    order keeps neighbors spatially local). Padding groups inherit the
    last cluster's box (harmless: their members are real clusters)."""
    c = c_lo.shape[0]
    pad = (-c) % g
    lo = np.concatenate([c_lo, np.repeat(c_lo[-1:], pad, axis=0)])
    hi = np.concatenate([c_hi, np.repeat(c_hi[-1:], pad, axis=0)])
    s_lo = lo.reshape(-1, g, 3).min(axis=1)
    s_hi = hi.reshape(-1, g, 3).max(axis=1)
    return np.ascontiguousarray(s_lo), np.ascontiguousarray(s_hi)


def build_clusters(tris: tri_mod.Triangles, leaf_tris: int = 32,
                   max_prims_per_leaf: int = 4,
                   super_size: int = 1) -> ClusterAccel:
    """Build the SAH tree, then cut it at subtrees of <= leaf_tris prims."""
    bounds = tri_mod.world_bounds_np(tris)
    bvh = build_bvh(bounds, max_prims_per_leaf)
    lo = np.asarray(bvh.lo)
    hi = np.asarray(bvh.hi)
    order = np.asarray(bvh.prim_order)
    nodes_arr, starts_arr, counts_arr = _cluster_cut(bvh, leaf_tris)
    c = nodes_arr.shape[0]
    c_lo = lo[nodes_arr]
    c_hi = hi[nodes_arr]
    # tri_id[i, k] = order[start_i + k] where k < count_i, else -1
    # (vectorized: the python per-cluster loop took ~30 s at 1M tris).
    k_grid = np.arange(leaf_tris)[None, :]
    in_range = k_grid < counts_arr[:, None]
    src = np.minimum(starts_arr[:, None] + k_grid, len(order) - 1)
    tri_id = np.where(in_range, order[src], -1).astype(np.int32)

    packed, packed_mt, _, _ = _pack_blocks(
        np.asarray(tris.v0), np.asarray(tris.v1), np.asarray(tris.v2),
        tri_id, leaf_tris,
    )
    id_pad = (-leaf_tris) % 128
    tri_id = np.pad(tri_id, ((0, 0), (0, id_pad)), constant_values=-1)
    # Host (numpy) leaves: traversal jits close over the accel and XLA
    # embeds host arrays for free; device leaves would d2h at trace time
    # (relay poison — see Scene.__init__).
    g = max(1, int(super_size))
    s_lo, s_hi = _super_bounds(c_lo, c_hi, g)
    if g > 1:
        # Pad the cluster tables to a whole number of super groups so the
        # super-permutation expands to valid cluster rows; padded rows
        # have tri_id -1 / zero MT consts (det = 0, never hit).
        pad = (-c) % g
        if pad:
            c_lo = np.concatenate([c_lo, np.repeat(c_lo[-1:], pad, 0)])
            c_hi = np.concatenate([c_hi, np.repeat(c_hi[-1:], pad, 0)])
            packed = np.pad(packed, ((0, pad), (0, 0)))
            packed_mt = np.pad(packed_mt, ((0, pad), (0, 0)))
            tri_id = np.pad(tri_id, ((0, pad), (0, 0)), constant_values=-1)
    return ClusterAccel(
        np.ascontiguousarray(c_lo), np.ascontiguousarray(c_hi),
        s_lo, s_hi, packed, packed_mt, tri_id, leaf_tris, g,
    )


def refit_clusters(accel: ClusterAccel, v0, v1, v2) -> ClusterAccel:
    """Refresh cluster bounds + packed blocks for moved vertices with
    fixed topology (the cluster analog of BVH refit, BASELINE config 5).
    Host-side numpy, once per frame: the refit result is closed over by
    the frame's render jits, and host leaves embed without the d2h a
    device-resident refit would force at trace time."""
    l = accel.leaf_tris
    tid = np.asarray(accel.tri_id)
    packed, packed_mt, lo_b, hi_b = _pack_blocks(
        np.asarray(v0), np.asarray(v1), np.asarray(v2), tid, l,
        want_bounds=True,
    )
    # _pack_blocks recomputes the MT constants through the same f64 path
    # as build_clusters, so a refit is now bit-identical to a rebuild
    # with the same block topology (the old numpy refit rounded in f32).
    import dataclasses

    s_lo, s_hi = _super_bounds(lo_b, hi_b, accel.super_size)
    return dataclasses.replace(
        accel, c_lo=lo_b, c_hi=hi_b, s_lo=s_lo, s_hi=s_hi,
        packed=packed, packed_mt=packed_mt,
    )


def _entry_boxes(lo, hi, o, d, t_max):
    """Slab entry distance per (ray, box): [N, B], inf on miss."""
    inv_d = 1.0 / d
    t0 = (lo[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
    t1 = (hi[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
    near = jnp.minimum(t0, t1)
    far = jnp.maximum(t0, t1)
    near = jnp.where(jnp.isnan(near), -jnp.inf, near)
    far = jnp.where(jnp.isnan(far), jnp.inf, far)
    tn = jnp.max(near, axis=-1)
    tf = jnp.min(far, axis=-1) * 1.00000024
    hit = (tn <= tf) & (tf > 0.0) & (tn < t_max[:, None])
    return jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf)


def _cluster_entry(accel: ClusterAccel, o, d, t_max):
    """Slab entry distance per (ray, cluster): [N, C], inf on miss."""
    return _entry_boxes(accel.c_lo, accel.c_hi, o, d, t_max)


def _bf16_floor(x):
    """Truncate f32 onto the bf16 grid: bit-mask the low 16 mantissa bits
    (round toward zero == round DOWN for the non-negative entry
    distances; +inf maps to +inf). A truncated entry stays a valid LOWER
    bound on the true slab entry, so the demand order stays identical
    (finiteness is preserved exactly) and the suffix-min early-out stays
    exactly conservative — hits are never dropped, a lane at worst sweeps
    one extra stage — while the [N, C] table, its permuted copy and the
    suffix scan move half the HBM bytes (the entry tier of the ARCH §7
    "bf16 cluster-entry culling" item; the hit test itself stays f32)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    f = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    return f.astype(jnp.bfloat16)


def _test_stage(accel: ClusterAccel, stage, h, perm, o, d, limit):
    """Test one stage (h clusters = h*L triangles) densely against ALL
    rays as a single fat [N, h*L] op.

    The only gather is h cluster rows (shared across every lane); the
    triangle soup is broadcast — pure VPU streaming. Returns
    (t [N], tri_id [N]) of the best hit below limit.
    """
    l = accel.leaf_tris
    seg = l * 3
    cids = jax.lax.dynamic_slice(perm, (stage * h,), (h,))
    rows = accel.packed[cids]                       # [h, P] tiny gather
    v0 = rows[:, 0 * seg:1 * seg].reshape(h * l, 3)
    v1 = rows[:, 1 * seg:2 * seg].reshape(h * l, 3)
    v2 = rows[:, 2 * seg:3 * seg].reshape(h * l, 3)
    tid = accel.tri_id[cids][:, :l].reshape(h * l)  # [h*L]
    hit, t, _, _, _ = tri_mod._intersect_core(
        v0[None, :, :], v1[None, :, :], v2[None, :, :],
        o[:, None, :], d[:, None, :], limit[:, None],
    )
    t = jnp.where(hit & (tid[None, :] >= 0), t, jnp.inf)
    j = jnp.argmin(t, axis=-1)
    best_t = jnp.min(t, axis=-1)  # == t[j], no gather
    best_i = tid[j]
    return best_t, best_i


def _test_stage_mt(accel: ClusterAccel, stage, h, perm, o, d, m, limit,
                   certified: bool = False):
    """MXU variant of _test_stage: the [N, h*L] pair grid comes from six
    [N,3] @ [3,h*L] matmuls (matmul-factored Moller-Trumbore, see
    accel/mxu.py). m = cross(o, d) per ray, precomputed by the caller.
    ``certified``: widen every boundary test by its certified rounding
    error (mxu.mt_epilogue_certified) so exact_shared_edges composes with
    this hot path — 6 extra abs-matmuls on VMEM-resident data."""
    l = accel.leaf_tris
    seg = l * 3
    cids = jax.lax.dynamic_slice(perm, (stage * h,), (h,))
    rows = accel.packed_mt[cids]                    # [h, 16L] tiny gather
    rhs = lambda k: rows[:, k * seg:(k + 1) * seg].reshape(
        h, 3, l
    ).transpose(1, 0, 2).reshape(3, h * l)
    n_m, e1_m, e2_m, w_m, q_m = rhs(0), rhs(1), rhs(2), rhs(3), rhs(4)
    v0n = rows[:, 5 * seg:5 * seg + l].reshape(h * l)
    tid = accel.tri_id[cids][:, :l].reshape(h * l)

    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    det = -mm(d, n_m)
    u_det = mm(m, e2_m) - mm(d, w_m)
    v_det = -mm(m, e1_m) - mm(d, q_m)
    t_det = mm(o, n_m) - v0n[None, :]
    if certified:
        o_a, d_a = jnp.abs(o), jnp.abs(d)
        ma = mxu_mod.abs_cross(o_a, d_a)
        eps = mxu_mod.MT_ERR_EPS
        err_det = eps * mm(d_a, jnp.abs(n_m))
        err_u = eps * (mm(ma, jnp.abs(e2_m)) + mm(d_a, jnp.abs(w_m)))
        err_v = eps * (mm(ma, jnp.abs(e1_m)) + mm(d_a, jnp.abs(q_m)))
        err_t = eps * (mm(o_a, jnp.abs(n_m)) + jnp.abs(v0n)[None, :])
        ok, t = mxu_mod.mt_epilogue_certified(
            det, u_det, v_det, t_det, err_det, err_u, err_v, err_t
        )
    else:
        ok, t = mxu_mod.mt_epilogue(det, u_det, v_det, t_det)
    hit = ok & (t < limit[:, None]) & (tid[None, :] >= 0)
    t = jnp.where(hit, t, jnp.inf)
    j = jnp.argmin(t, axis=-1)
    best_t = jnp.min(t, axis=-1)  # == t[j], no gather
    best_i = tid[j]
    return best_t, best_i


def traverse(accel: ClusterAccel, o, d, t_max, stage_clusters: int = 64,
             any_hit: bool = False, use_mxu: bool = True,
             entry_bf16: bool = True, certified: bool = False):
    """Closest-hit (or any-hit) via a dense demand-ordered cluster sweep.

    Clusters are ordered once by how many rays enter their AABB; stages of
    ``stage_clusters`` are then swept densely against the whole ray batch
    (dynamic-slice + broadcast — zero per-ray gathers, pure VPU streaming).
    A lane retires when the minimum entry distance over all *unswept*
    clusters (a precomputed suffix-min over the demand order) exceeds its
    current best hit — the exact early-out of stack traversal without
    per-lane control flow. Coherent ray batches touch few clusters, so few
    stages run; the adversarial worst case degrades to brute force, never
    to wrong results.

    Returns (hit [N] bool, t [N], tri_id [N] int32).
    """
    n = o.shape[0]
    c = accel.c_lo.shape[0]
    g = accel.super_size
    # np (host) leaves -> jnp so the traced row gathers below work.
    accel = jax.tree.map(jnp.asarray, accel)

    if g > 1:
        # Two-level: the [N, C] table shrinks to [N, C/G] super entries.
        # A super's entry lower-bounds its members', so demand order and
        # suffix-min early-out stay conservative (exactness preserved).
        h = max(g, (min(stage_clusters, c) // g) * g)
        h_s = h // g
        entry = _entry_boxes(accel.s_lo, accel.s_hi, o, d, t_max)  # [N, S]
        if entry_bf16:
            entry = _bf16_floor(entry)
        s_count = entry.shape[1]
        demand = jnp.sum(jnp.isfinite(entry), axis=0)
        perm_s = jnp.argsort(-demand).astype(jnp.int32)            # [S]
        entry_g = jnp.take(entry, perm_s, axis=1)
        n_stages = -(-s_count // h_s)
        pad_s = n_stages * h_s - s_count
        entry_stage = jnp.min(
            jnp.pad(entry_g, ((0, 0), (0, pad_s)), constant_values=jnp.inf)
            .reshape(n, n_stages, h_s),
            axis=2,
        )
        # Super perm -> cluster perm (build pads C to S*G, so every
        # expanded id is a valid row; padded rows never hit).
        perm = (
            perm_s[:, None] * g + jnp.arange(g, dtype=jnp.int32)[None, :]
        ).reshape(-1)
        perm = jnp.pad(perm, (0, pad_s * g + h))
    else:
        h = min(stage_clusters, c)
        entry = _cluster_entry(accel, o, d, t_max)           # [N, C]
        if entry_bf16:
            entry = _bf16_floor(entry)

        # Global demand order (one small sort) + per-lane suffix minima.
        demand = jnp.sum(jnp.isfinite(entry), axis=0)
        perm = jnp.argsort(-demand).astype(jnp.int32)        # [C]
        entry_g = jnp.take(entry, perm, axis=1)              # column permute
        # The early-out only ever reads the suffix minimum at STAGE
        # boundaries, so reduce per stage first ([N, C] -> [N, S]) and
        # reverse-cummin over the S stages — h x less scan traffic than
        # the per-column suffix scan (C can be ~10k at 1M triangles).
        n_stages = -(-c // h)
        pad_c = n_stages * h - c
        entry_stage = jnp.min(
            jnp.pad(entry_g, ((0, 0), (0, pad_c)), constant_values=jnp.inf)
            .reshape(n, n_stages, h),
            axis=2,
        )                                                     # [N, S]
        perm = jnp.pad(perm, (0, pad_c + h))

    stage_suffix = jax.lax.associative_scan(
        jnp.minimum, entry_stage, reverse=True, axis=1
    )
    # stage_suffix[:, s] = min entry over stages >= s; append inf for the
    # lookup at s+1 == n_stages.
    stage_suffix = jnp.pad(
        stage_suffix, ((0, 0), (0, 1)), constant_values=jnp.inf
    )

    def cond(state):
        s, best_t, best_i, done = state
        return (s < n_stages) & ~jnp.all(done)

    m = jnp.cross(o, d)

    def body(state):
        s, best_t, best_i, done = state
        limit = jnp.where(done, -jnp.inf, jnp.minimum(best_t, t_max))
        if use_mxu:
            stage_t, stage_i = _test_stage_mt(accel, s, h, perm, o, d, m,
                                              limit, certified)
        else:
            stage_t, stage_i = _test_stage(accel, s, h, perm, o, d, limit)
        better = stage_t < best_t
        best_t = jnp.where(better, stage_t, best_t)
        best_i = jnp.where(better, stage_i, best_i)
        next_min = jax.lax.dynamic_slice(
            stage_suffix, (0, s + 1), (n, 1)
        )[:, 0]
        if any_hit:
            done = done | (best_t <= t_max)
        done = done | (next_min >= jnp.minimum(best_t, t_max))
        return (s + 1, best_t, best_i, done)

    state = (
        jnp.asarray(0, jnp.int32),
        jnp.full((n,), jnp.inf, F32),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), bool),
    )
    _, best_t, best_i, _ = jax.lax.while_loop(cond, body, state)
    hit = (best_i >= 0) & (best_t <= t_max)
    return hit, jnp.where(hit, best_t, jnp.inf), jnp.maximum(best_i, 0)


def _sort_key(o, d, lo, inv_extent):
    """Coherence sort key per ray: direction octant (3 high bits) then a
    21-bit Morton code of the quantized origin. Rays sharing a key prefix
    enter similar cluster sets, so a sorted chunk's demand-ordered sweep
    retires in few stages — the batch-wise analog of packet reordering.
    """
    octant = (
        (d[:, 0] < 0).astype(jnp.uint32)
        | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
        | ((d[:, 2] < 0).astype(jnp.uint32) << 2)
    )
    q = jnp.clip(
        ((o - lo) * inv_extent * 127.0), 0.0, 127.0
    ).astype(jnp.uint32)                                   # 7 bits/axis

    def spread(x):  # 7 bits -> every 3rd bit
        x = (x | (x << 8)) & jnp.uint32(0x0100F00F)
        x = (x | (x << 4)) & jnp.uint32(0x010C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return (octant << 21) | morton


class ClusterAccelerator:
    """Scene accelerator: cluster wavefront for triangles + brute-force
    spheres (same interface as bvh.BVHAccelerator). Rays are processed in
    chunks so the [rays x clusters] entry table stays bounded; multi-chunk
    batches are coherence-sorted first (see _sort_key) so each chunk's
    sweep retires early."""

    def __init__(self, accel: ClusterAccel, stage_clusters: int = 64,
                 ray_chunk: int = 16384, sort_rays: bool = True,
                 certified: bool = False):
        self.clusters = accel
        self.stage_clusters = int(stage_clusters)
        self.ray_chunk = int(ray_chunk)
        self.sort_rays = bool(sort_rays)
        # Certified-widened epilogue (exact_shared_edges on the hot path).
        self.certified = bool(certified)
        if isinstance(accel.c_lo, np.ndarray):
            # Host-built accel: numpy bounds (a device reduction here
            # would d2h at trace time when jits close over them).
            lo = np.asarray(accel.c_lo).min(axis=0)
            hi = np.asarray(accel.c_hi).max(axis=0)
            self._world_lo = lo
            self._world_inv_extent = (
                1.0 / np.maximum(hi - lo, 1e-12)
            ).astype(np.float32)
        else:
            # Traced / device-built accel (animated-geometry path): keep
            # the bounds traced — they only feed the coherence sort key.
            lo = jnp.min(accel.c_lo, axis=0)
            hi = jnp.max(accel.c_hi, axis=0)
            self._world_lo = lo
            self._world_inv_extent = (
                1.0 / jnp.maximum(hi - lo, 1e-12)
            ).astype(jnp.float32)

    def refit(self, v0, v1, v2) -> None:
        """Refresh geometry for moved vertices with fixed topology
        (BASELINE config 5). Caller must scene.bump_version() afterwards —
        traversal jits bake the accel tables in at trace time."""
        self.clusters = refit_clusters(self.clusters, v0, v1, v2)

    def _chunked(self, o, d, t_max, any_hit):
        n = o.shape[0]
        if n <= self.ray_chunk:
            return traverse(
                self.clusters, o, d, t_max, self.stage_clusters, any_hit,
                certified=self.certified,
            )
        order = None
        if self.sort_rays:
            key = _sort_key(
                o, d, jnp.asarray(self._world_lo),
                jnp.asarray(self._world_inv_extent),
            )
            order = jnp.argsort(key)
            o, d, t_max = o[order], d[order], t_max[order]
        outs = []
        for s in range(0, n, self.ray_chunk):
            e = min(s + self.ray_chunk, n)
            outs.append(traverse(
                self.clusters, o[s:e], d[s:e], t_max[s:e],
                self.stage_clusters, any_hit, certified=self.certified,
            ))
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


def attach(scene, leaf_tris: int = 32, stage_clusters: int = 64,
           max_prims_per_leaf: int = 4, ray_chunk: int = 16384,
           super_size: int = 1, certified: bool | None = None):
    """Build the cluster accelerator for the scene and install it.
    ``certified`` defaults to the scene's exact_shared_edges setting."""
    if scene.n_triangles == 0:
        return scene
    if certified is None:
        certified = bool(getattr(scene, "exact_edges", False))
    tris = getattr(scene, "triangles_host", scene.triangles)
    accel = build_clusters(tris, leaf_tris, max_prims_per_leaf,
                           super_size=super_size)
    scene.bump_version()
    scene.accel = ClusterAccelerator(accel, stage_clusters, ray_chunk,
                                     certified=certified)
    return scene
