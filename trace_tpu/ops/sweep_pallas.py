"""Pallas per-ray-block sparse sweep — the hot-path traversal kernel.

The XLA cluster sweep (accel/clusters.py) uses ONE global demand order
for a whole 16-65k-ray chunk: every stage tests every lane, and a
semi-coherent chunk pays for the union of all its blocks' working sets.
This kernel gives each 512-ray block its OWN demand order and early-out,
with the whole per-stage pipeline fused in VMEM:

- Per block, XLA precomputes the demand-ordered super-cluster id list and
  the suffix-min of entry distances (both tiny: [NB, S]); they sit in
  SMEM for scalar control flow.
- The kernel walks the list with a device-side while loop: ONE DMA pulls
  the super's Moller-Trumbore constant panel [16, G*L] from HBM into
  VMEM (triangle ids are slot-local iotas mapped back to global ids
  outside the kernel — no id slab is moved), six [B,3] @ [3, G*L] MXU
  matmuls evaluate the whole (block x super) test grid, and the epilogue
  (sign fixup, u/v/t bounds, per-lane min + id select) never leaves VMEM
  — the [B, G*L] grid that the XLA sweep streams through HBM does not
  exist here.
- The block retires when the next suffix-min exceeds every live lane's
  best hit — the same conservative early-out as the cluster sweep
  (clusters.py:traverse), at block granularity.
- ``pipeline=True`` double-buffers the panel DMA behind the MXU work;
  ``panel_bf16=True`` halves the panel bytes (A/B knob — perturbs
  boundary hits, see SweepTables); ``certified=True`` widens the epilogue
  by proven error bounds (exact_shared_edges on this hot path).

Exactness: the id list covers every super the block's rays enter (the
suffix turns +inf exactly where entered supers end), entries lower-bound
member clusters, and the padded tail rows carry zero constants (det = 0,
never hit). tests/test_sweep_pallas.py checks the kernel (interpret mode)
against the brute-force watertight oracle.

Reference economics target: bvh.jl:212-299's per-ray early-out, which the
global sweep only approximates for incoherent (bounce-2+) rays.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..shapes import sphere as sph_mod
from ..accel.mxu import mt_epilogue, mt_epilogue_certified, MT_ERR_EPS
from ..accel.clusters import ClusterAccel, build_clusters, _entry_boxes, \
    _sort_key

F32 = jnp.float32
RAY_ROWS = 16   # o(3) d(3) m(3) tmax(1) pad(6) -> one sublane tile


# Certified widening sized to the panel precision (the eps fed to the
# error-bound abs-matmuls below). MT_ERR_EPS covers f32 panels (algorithm
# rounding + one f64->f32 constant rounding). Half-precision panels add a
# constant representation error that dominates:
#   raw bf16: RN to 8 mantissa bits, rel err <= 2^-9 per constant;
#   hi/lo double-bf16: lo captures the hi residual, rel err <= 2^-18
#     (+ one f32 add rounding at reconstruction).
# 1.25x / 2x margins make the bound safely conservative — over-widening
# only fattens silhouettes, never drops hits.
BF16_PANEL_ERR_EPS = np.float32(1.25 * 2.0 ** -9)
HILO_PANEL_ERR_EPS = np.float32(2.0 ** -17)


def _panel_test(certified, err_eps, mm, o_m, d_m, m_m,
                n_p, e1_p, e2_p, w_p, q_p, v0n):
    """Shared per-super epilogue of both kernel variants: the six MT
    matmul panels + validity test. ``certified`` (static) adds the
    error-bound abs-matmuls (mxu.mt_epilogue_certified), with ``err_eps``
    (static) sized to the panel precision, so exact_shared_edges composes
    with this kernel — and a certified bf16 panel stays a conservative
    SUPERSET of the f32 acceptance at half the DMA bytes. The extra
    contractions read only VMEM-resident data, no extra HBM traffic."""
    det = -mm(d_m, n_p)
    u_det = mm(m_m, e2_p) - mm(d_m, w_p)
    v_det = -mm(m_m, e1_p) - mm(d_m, q_p)
    t_det = mm(o_m, n_p) - v0n
    if not certified:
        return mt_epilogue(det, u_det, v_det, t_det)
    o_a, d_a = jnp.abs(o_m), jnp.abs(d_m)            # [3, B]
    # ABS-cross over the component axis (axis 0 in kernel layout).
    ma = jnp.stack(
        [o_a[1] * d_a[2] + o_a[2] * d_a[1],
         o_a[2] * d_a[0] + o_a[0] * d_a[2],
         o_a[0] * d_a[1] + o_a[1] * d_a[0]], axis=0,
    )
    eps = jnp.float32(err_eps)
    err_det = eps * mm(d_a, jnp.abs(n_p))
    err_u = eps * (mm(ma, jnp.abs(e2_p)) + mm(d_a, jnp.abs(w_p)))
    err_v = eps * (mm(ma, jnp.abs(e1_p)) + mm(d_a, jnp.abs(q_p)))
    err_t = eps * (mm(o_a, jnp.abs(n_p)) + jnp.abs(v0n))
    return mt_epilogue_certified(
        det, u_det, v_det, t_det, err_det, err_u, err_v, err_t
    )


class SweepTables:
    """Host-packed kernel tables derived from a ClusterAccel.

    Since round 3 the per-step DMA is the MT panel ALONE (32 KB at
    G=8/L=64): triangle ids are sweep-LOCAL — slot (super s, column k)
    IS id s*GLP + k, computed in-kernel from an iota — and the winner's
    local id maps back to the global triangle id through ``slot_to_tri``
    (one [N] gather per chunk, outside the kernel). Round 2 DMA'd a
    [8, GLP] int32 id slab per step (16 KB, 7/8 of it sublane padding);
    dropping it cuts per-step HBM bytes 1.5x and halves the DMA count.
    Padding slots carry zero MT constants (det = 0) so they self-mask in
    the epilogue — no id-validity test needed in the kernel.

    ``panel_bf16``: store the panel in bfloat16 — HALF the per-step DMA
    bytes, upcast to f32 in VMEM before the contraction. The constants
    then carry ~2^-9 relative error, so boundary hits can differ from the
    f32 oracle (measured on-chip by bench.py's sweep_agreement probe);
    OFF by default — the exactness default is f32. Paired with
    ``certified=True`` the epilogue widens by BF16_PANEL_ERR_EPS, making
    the half-DMA acceptance a conservative SUPERSET of the f32 one.

    ``panel_hilo``: hi/lo double-bf16 split — panel rows double to 32
    (hi block then lo block), reconstructed as f32(hi)+f32(lo) in VMEM.
    SAME total DMA bytes as f32 (2 x bf16), constants accurate to ~2^-18
    relative (lo captures the hi rounding residual) — the A/B arm probing
    whether bf16-granularity DMA has a throughput edge at equal bytes."""

    def __init__(self, accel: ClusterAccel, group: int = 8,
                 panel_bf16: bool = False, panel_hilo: bool = False):
        assert not (panel_bf16 and panel_hilo), \
            "panel_bf16 and panel_hilo are mutually exclusive"
        l = accel.leaf_tris
        c = np.asarray(accel.tri_id).shape[0]
        g = int(group)
        pad_c = (-c) % g
        # packed_mt rows: n|e1|e2|w|q (3l each) then v0n (l) = 16l floats.
        mt = np.asarray(accel.packed_mt)[:, :16 * l]
        tid = np.asarray(accel.tri_id)[:, :l]
        c_lo = np.asarray(accel.c_lo)
        c_hi = np.asarray(accel.c_hi)
        if pad_c:
            mt = np.pad(mt, ((0, pad_c), (0, 0)))
            tid = np.pad(tid, ((0, pad_c), (0, 0)), constant_values=-1)
            c_lo = np.concatenate([c_lo, np.repeat(c_lo[-1:], pad_c, 0)])
            c_hi = np.concatenate([c_hi, np.repeat(c_hi[-1:], pad_c, 0)])
        s = (c + pad_c) // g
        gl = g * l
        self.gl_pad = -(-gl // 128) * 128
        # [S, 16, GL]: row k = component k across the super's g clusters.
        panel = mt.reshape(s, g, 16, l).transpose(0, 2, 1, 3).reshape(
            s, 16, gl
        )
        # pad already yields contiguous f32 — avoid two further copies.
        self.panel_bf16 = bool(panel_bf16)
        self.panel_hilo = bool(panel_hilo)
        panel = np.pad(panel, ((0, 0), (0, 0), (0, self.gl_pad - gl)))
        if panel_bf16:
            # Host-side cast (ml_dtypes ships with JAX): table packing
            # must never touch the device — the round-trip a device cast
            # implies (h2d 64 MB, cast, d2h) faults the axon TPU relay.
            import ml_dtypes

            self.panel = np.ascontiguousarray(
                panel.astype(np.float32).astype(ml_dtypes.bfloat16)
            )
        elif panel_hilo:
            import ml_dtypes

            pf = panel.astype(np.float32)
            hi = pf.astype(ml_dtypes.bfloat16)
            lo = (pf - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
            # [S, 32, GLP]: rows 0-15 hi, rows 16-31 lo — one DMA per
            # super, decoded in VMEM as f32(hi) + f32(lo).
            self.panel = np.ascontiguousarray(
                np.concatenate([hi, lo], axis=1))
        else:
            self.panel = np.asarray(panel, np.float32)
        # Local slot id -> global triangle id (-1 = padding slot).
        slot = np.full((s, self.gl_pad), -1, np.int32)
        slot[:, :gl] = tid.reshape(s, gl)
        self.slot_to_tri = np.ascontiguousarray(slot.reshape(-1))
        self.s_lo = np.ascontiguousarray(
            c_lo.reshape(s, g, 3).min(axis=1))
        self.s_hi = np.ascontiguousarray(
            c_hi.reshape(s, g, 3).max(axis=1))
        self.n_supers = s
        self.group = g
        self.leaf_tris = l


def _sweep_tables_flatten(tb):
    return ((tb.panel, tb.slot_to_tri, tb.s_lo, tb.s_hi),
            (tb.n_supers, tb.group, tb.leaf_tris, tb.gl_pad,
             tb.panel_bf16, tb.panel_hilo))


def _sweep_tables_unflatten(aux, leaves):
    tb = object.__new__(SweepTables)
    tb.panel, tb.slot_to_tri, tb.s_lo, tb.s_hi = leaves
    (tb.n_supers, tb.group, tb.leaf_tris, tb.gl_pad,
     tb.panel_bf16, tb.panel_hilo) = aux
    return tb


# SweepTables is a pytree so huge-scene tables can be threaded through
# jit boundaries as TRACED arguments (integrators.common.prepare_geometry)
# instead of being embedded as constants — a >10M-tri panel is ~1 GB of
# jit constant, which the remote-compile relay rejects (broken pipe).
jax.tree_util.register_pytree_node(
    SweepTables, _sweep_tables_flatten, _sweep_tables_unflatten)


def _sweep_kernel(any_hit, n_supers, certified, err_eps, hilo,
                  collect_stats,
                  idx_ref, suffix_ref,            # SMEM per block
                  rays_ref,                        # VMEM [16, B]
                  panel_hbm,                       # HBM full panel table
                  *out_and_scratch):
    if collect_stats:
        bt_out, bi_out, st_out, panel_buf, sem = out_and_scratch
    else:
        bt_out, bi_out, panel_buf, sem = out_and_scratch
        st_out = None
    b = rays_ref.shape[1]
    gl = panel_buf.shape[-1]
    o_x, o_y, o_z = rays_ref[0, :], rays_ref[1, :], rays_ref[2, :]
    d_x, d_y, d_z = rays_ref[3, :], rays_ref[4, :], rays_ref[5, :]
    m_x, m_y, m_z = rays_ref[6, :], rays_ref[7, :], rays_ref[8, :]
    t_lim = rays_ref[9, :]                        # [B]

    o_m = jnp.stack([o_x, o_y, o_z], axis=0)      # [3, B]
    d_m = jnp.stack([d_x, d_y, d_z], axis=0)
    m_m = jnp.stack([m_x, m_y, m_z], axis=0)

    def mm(a, rhs):  # [3, B] x [3, GL] -> [B, GL]
        return jax.lax.dot_general(
            a, rhs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    # Local slot ids: column k of super s IS id s*GL + k (the tid slab
    # DMA of round 2 is gone; padding slots self-mask via zero consts).
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, gl), 1)

    def body(state):
        s, best_t, best_i = state
        sid = idx_ref[0, s]
        cp = pltpu.make_async_copy(panel_hbm.at[sid], panel_buf, sem)
        cp.start()
        cp.wait()

        if hilo:   # f32(hi) + f32(lo): ~2^-18-accurate reconstruction
            f32 = lambda r0, r1: (panel_buf[r0:r1].astype(jnp.float32)
                                  + panel_buf[16 + r0:16 + r1]
                                  .astype(jnp.float32))
        else:      # astype is a no-op for f32 panels
            f32 = lambda r0, r1: panel_buf[r0:r1].astype(jnp.float32)
        n_p = f32(0, 3)
        e1_p = f32(3, 6)
        e2_p = f32(6, 9)
        w_p = f32(9, 12)
        q_p = f32(12, 15)
        v0n = f32(15, 16)                          # [1, GL]
        tid = col_ids + sid * gl                   # [1, GL] local ids

        core_ok, t = _panel_test(certified, err_eps, mm, o_m, d_m, m_m,
                                 n_p, e1_p, e2_p, w_p, q_p, v0n)
        limit = jnp.minimum(best_t, t_lim)[:, None]   # [B, 1]
        ok = core_ok & (t < limit)
        t = jnp.where(ok, t, jnp.inf)
        tmin = jnp.min(t, axis=1)                     # [B]
        # Gather-free id select: min id among slots equal to the min.
        ids = jnp.min(
            jnp.where(t <= tmin[:, None], tid, jnp.int32(0x7FFFFFFF)),
            axis=1,
        )
        better = tmin < best_t
        best_t = jnp.where(better, tmin, best_t)
        best_i = jnp.where(better, ids, best_i)
        return (s + 1, best_t, best_i)

    def cond(state):
        s, best_t, best_i = state
        if any_hit:
            lane_limit = jnp.where(best_t <= t_lim, -jnp.inf, t_lim)
        else:
            lane_limit = jnp.minimum(best_t, t_lim)
        return (s < n_supers) & (suffix_ref[0, s] < jnp.max(lane_limit))

    init = (
        jnp.int32(0),
        jnp.full((b,), jnp.inf, F32),
        jnp.full((b,), jnp.int32(0x7FFFFFFF)),
    )
    s_exit, best_t, best_i = jax.lax.while_loop(cond, body, init)
    found = best_i != jnp.int32(0x7FFFFFFF)
    # 8-sublane output blocks (Mosaic tile rule); row 0 carries the data.
    bt_out[:, :] = jnp.broadcast_to(
        jnp.where(found, best_t, jnp.inf)[None, :], bt_out.shape
    )
    bi_out[:, :] = jnp.broadcast_to(
        jnp.where(found, best_i, -1)[None, :], bi_out.shape
    )
    if collect_stats:
        # Supers actually swept by this block (roofline instrumentation:
        # HBM bytes moved = steps x panel bytes).
        st_out[:, :] = jnp.broadcast_to(
            s_exit[None, None], st_out.shape
        ).astype(jnp.int32)


def _sweep_kernel_pipelined(any_hit, n_supers, certified, err_eps, hilo,
                            collect_stats,
                            idx_ref, suffix_ref,     # SMEM per block
                            rays_ref,                 # VMEM [16, B]
                            panel_hbm,                # HBM full panel table
                            *out_and_scratch):
    """Double-buffered variant of :func:`_sweep_kernel`: while the MXU
    evaluates super ``s``'s panel, the DMA engine already pulls super
    ``s+1``'s into the other buffer slot, hiding the HBM latency behind
    compute. Same demand order / suffix early-out / epilogue; the panel
    prefetched past the last executed step is drained after the loop
    (idx rows are zero-padded, so the overshoot index is always valid)."""
    if collect_stats:
        bt_out, bi_out, st_out, panel_buf, sem = out_and_scratch
    else:
        bt_out, bi_out, panel_buf, sem = out_and_scratch
        st_out = None
    b = rays_ref.shape[1]
    gl = panel_buf.shape[-1]
    o_x, o_y, o_z = rays_ref[0, :], rays_ref[1, :], rays_ref[2, :]
    d_x, d_y, d_z = rays_ref[3, :], rays_ref[4, :], rays_ref[5, :]
    m_x, m_y, m_z = rays_ref[6, :], rays_ref[7, :], rays_ref[8, :]
    t_lim = rays_ref[9, :]

    o_m = jnp.stack([o_x, o_y, o_z], axis=0)
    d_m = jnp.stack([d_x, d_y, d_z], axis=0)
    m_m = jnp.stack([m_x, m_y, m_z], axis=0)

    def mm(a, rhs):
        return jax.lax.dot_general(
            a, rhs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, gl), 1)

    def start(slot, s):
        sid = idx_ref[0, s]
        pltpu.make_async_copy(
            panel_hbm.at[sid], panel_buf.at[slot], sem.at[slot]
        ).start()

    def wait(slot):
        sid0 = idx_ref[0, 0]  # shape donor only; wait is by semaphore
        pltpu.make_async_copy(
            panel_hbm.at[sid0], panel_buf.at[slot], sem.at[slot]
        ).wait()

    def body(state):
        s, best_t, best_i = state
        slot = jax.lax.rem(s, 2)
        # Prefetch s+1 into the other slot (its previous occupant was
        # consumed by iteration s-1). s+1 <= n_supers < s_pad: in-range,
        # and a zero pad id is a valid panel row.
        start(1 - slot, s + 1)
        wait(slot)

        if hilo:   # f32(hi) + f32(lo): ~2^-18-accurate reconstruction
            f32 = lambda r0, r1: (
                panel_buf[slot, r0:r1].astype(jnp.float32)
                + panel_buf[slot, 16 + r0:16 + r1].astype(jnp.float32))
        else:      # astype is a no-op for f32 panels
            f32 = lambda r0, r1: panel_buf[slot, r0:r1].astype(jnp.float32)
        n_p = f32(0, 3)
        e1_p = f32(3, 6)
        e2_p = f32(6, 9)
        w_p = f32(9, 12)
        q_p = f32(12, 15)
        v0n = f32(15, 16)
        tid = col_ids + idx_ref[0, s] * gl

        core_ok, t = _panel_test(certified, err_eps, mm, o_m, d_m, m_m,
                                 n_p, e1_p, e2_p, w_p, q_p, v0n)
        limit = jnp.minimum(best_t, t_lim)[:, None]
        ok = core_ok & (t < limit)
        t = jnp.where(ok, t, jnp.inf)
        tmin = jnp.min(t, axis=1)
        ids = jnp.min(
            jnp.where(t <= tmin[:, None], tid, jnp.int32(0x7FFFFFFF)),
            axis=1,
        )
        better = tmin < best_t
        best_t = jnp.where(better, tmin, best_t)
        best_i = jnp.where(better, ids, best_i)
        return (s + 1, best_t, best_i)

    def cond(state):
        s, best_t, best_i = state
        if any_hit:
            lane_limit = jnp.where(best_t <= t_lim, -jnp.inf, t_lim)
        else:
            lane_limit = jnp.minimum(best_t, t_lim)
        return (s < n_supers) & (suffix_ref[0, s] < jnp.max(lane_limit))

    start(0, 0)
    init = (
        jnp.int32(0),
        jnp.full((b,), jnp.inf, F32),
        jnp.full((b,), jnp.int32(0x7FFFFFFF)),
    )
    s_exit, best_t, best_i = jax.lax.while_loop(cond, body, init)
    # Drain the one outstanding prefetch (for step s_exit; when the loop
    # never ran, that is the pre-loop start(0, 0)).
    wait(jax.lax.rem(s_exit, 2))
    found = best_i != jnp.int32(0x7FFFFFFF)
    bt_out[:, :] = jnp.broadcast_to(
        jnp.where(found, best_t, jnp.inf)[None, :], bt_out.shape
    )
    bi_out[:, :] = jnp.broadcast_to(
        jnp.where(found, best_i, -1)[None, :], bi_out.shape
    )
    if collect_stats:
        st_out[:, :] = jnp.broadcast_to(
            s_exit[None, None], st_out.shape
        ).astype(jnp.int32)


class PallasSweepAccelerator:
    """Scene accelerator driving the sparse sweep kernel (same interface
    as accel.clusters.ClusterAccelerator). Triangle tables live in HBM;
    per-block order/suffix tables are built by XLA per ray chunk."""

    def __init__(self, accel: ClusterAccel, group: int = 8,
                 block_rays: int = 512, ray_chunk: int = 16384,
                 sort_rays: bool = True, interpret: bool = False,
                 pipeline: bool = False, certified: bool = False,
                 panel_bf16: bool = False, panel_hilo: bool = False,
                 collect_stats: bool = False):
        self.clusters = accel
        self.tables = SweepTables(accel, group, panel_bf16=panel_bf16,
                                  panel_hilo=panel_hilo)
        self.block_rays = int(block_rays)
        self.ray_chunk = int(ray_chunk)
        self.sort_rays = bool(sort_rays)
        self.interpret = bool(interpret)
        self.pipeline = bool(pipeline)
        # Certified-widened epilogue (exact_shared_edges on the hot path).
        self.certified = bool(certified)
        # Roofline instrumentation: when set, each chunk also returns the
        # per-block sweep step counts; _last_steps accumulates the total.
        self.collect_stats = bool(collect_stats)
        self._last_steps = None
        lo = self.tables.s_lo.min(axis=0)
        hi = self.tables.s_hi.max(axis=0)
        self._world_lo = lo
        self._world_inv_extent = (
            1.0 / np.maximum(hi - lo, 1e-12)
        ).astype(np.float32)

    @classmethod
    def from_tables(cls, tables: SweepTables, *, block_rays: int = 128,
                    ray_chunk: int = 8192, sort_rays: bool = True,
                    interpret: bool = False, pipeline: bool = False,
                    certified: bool = False):
        """Wrap pre-packed (possibly TRACED) kernel tables directly —
        the huge-static-scene path: the caller packs SweepTables on host
        once, threads them through the jit boundary as arguments
        (prepare_geometry/apply_geometry), and this wrapper runs the
        kernel on them without a ClusterAccel or any host packing. World
        bounds for ray sorting are reduced from the (traced) super boxes
        inside the jit (_chunked)."""
        self = object.__new__(cls)
        self.clusters = None
        self.tables = tables
        self.block_rays = int(block_rays)
        self.ray_chunk = int(ray_chunk)
        self.sort_rays = bool(sort_rays)
        self.interpret = bool(interpret)
        self.pipeline = bool(pipeline)
        self.certified = bool(certified)
        self.collect_stats = False
        self._last_steps = None
        self._world_lo = None   # traced tables: reduce lazily in-jit
        self._world_inv_extent = None
        return self

    def refit(self, v0, v1, v2) -> None:
        """Refresh geometry for moved vertices with fixed topology: refit
        the underlying ClusterAccel, then repack the kernel tables (the
        kernel reads SweepTables, not the ClusterAccel — a refit that only
        swapped ``self.clusters`` would leave the kernel on stale
        geometry). Caller must scene.bump_version() afterwards."""
        from ..accel.clusters import refit_clusters

        self.clusters = refit_clusters(self.clusters, v0, v1, v2)
        self.tables = SweepTables(self.clusters, self.tables.group,
                                  panel_bf16=self.tables.panel_bf16,
                                  panel_hilo=self.tables.panel_hilo)
        lo = self.tables.s_lo.min(axis=0)
        hi = self.tables.s_hi.max(axis=0)
        self._world_lo = lo
        self._world_inv_extent = (
            1.0 / np.maximum(hi - lo, 1e-12)
        ).astype(np.float32)

    # -- kernel invocation over one chunk ---------------------------------
    def _traverse_chunk(self, o, d, t_max, any_hit):
        tb = self.tables
        b = self.block_rays
        n = o.shape[0]
        pad = (-n) % b
        npad = n + pad
        nb = npad // b
        s_count = tb.n_supers

        o_p = jnp.pad(o, ((0, pad), (0, 0)))
        d_p = jnp.pad(d, ((0, pad), (0, 0)))
        t_p = jnp.pad(
            jnp.where(jnp.isfinite(t_max), t_max, F32(3e38)),
            (0, pad), constant_values=-1.0,   # dead padded lanes
        )

        # Per-block demand order + suffix over SUPER entries.
        entry = _entry_boxes(
            jnp.asarray(tb.s_lo), jnp.asarray(tb.s_hi), o_p, d_p,
            jnp.maximum(t_p, 0.0),
        )                                           # [Np, S]
        entry = jnp.where(t_p[:, None] < 0.0, jnp.inf, entry)
        entry_b = jnp.min(entry.reshape(nb, b, s_count), axis=1)  # [NB, S]
        order = jnp.argsort(entry_b, axis=1).astype(jnp.int32)    # near-first
        entry_o = jnp.take_along_axis(entry_b, order, axis=1)
        suffix = jax.lax.associative_scan(
            jnp.minimum, entry_o, reverse=True, axis=1
        )
        # Mosaic block-shape rule: last two dims (8, 128)-divisible. Each
        # block's row is padded to an 8-sublane group (rows 1-7 unused).
        s_pad = -(-(s_count + 1) // 128) * 128
        suffix = jnp.pad(suffix, ((0, 0), (0, s_pad - s_count)),
                         constant_values=jnp.inf)
        order = jnp.pad(order, ((0, 0), (0, s_pad - s_count)))
        suffix = jnp.pad(suffix[:, None, :], ((0, 0), (0, 7), (0, 0))
                         ).reshape(nb * 8, s_pad)
        order = jnp.pad(order[:, None, :], ((0, 0), (0, 7), (0, 0))
                        ).reshape(nb * 8, s_pad)

        m = jnp.cross(o_p, d_p)
        pack = jnp.stack(
            [o_p[:, 0], o_p[:, 1], o_p[:, 2],
             d_p[:, 0], d_p[:, 1], d_p[:, 2],
             m[:, 0], m[:, 1], m[:, 2], t_p], axis=0,
        ).reshape(10, nb, b).transpose(1, 0, 2)        # [NB, 10, B]
        rays = jnp.pad(pack, ((0, 0), (0, RAY_ROWS - 10), (0, 0)))

        gl = tb.gl_pad
        hilo = bool(getattr(tb, "panel_hilo", False))
        panel_dtype = (jnp.bfloat16 if (tb.panel_bf16 or hilo)
                       else jnp.float32)
        rows = 32 if hilo else 16
        # Certified widening sized to the panel precision (see
        # BF16_PANEL_ERR_EPS / HILO_PANEL_ERR_EPS).
        err_eps = float(
            BF16_PANEL_ERR_EPS if tb.panel_bf16
            else HILO_PANEL_ERR_EPS if hilo else MT_ERR_EPS)
        stats = bool(getattr(self, "collect_stats", False))
        if self.pipeline:
            kernel = functools.partial(
                _sweep_kernel_pipelined, any_hit, s_count, self.certified,
                err_eps, hilo, stats,
            )
            scratch = [
                pltpu.VMEM((2, rows, gl), panel_dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            kernel = functools.partial(_sweep_kernel, any_hit, s_count,
                                       self.certified, err_eps, hilo,
                                       stats)
            scratch = [
                pltpu.VMEM((rows, gl), panel_dtype),
                pltpu.SemaphoreType.DMA(()),
            ]
        out_specs = [
            pl.BlockSpec((8, b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((nb * 8, b), F32),
            jax.ShapeDtypeStruct((nb * 8, b), jnp.int32),
        ]
        if stats:
            out_specs.append(pl.BlockSpec((8, b), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((nb * 8, b), jnp.int32))
        outs = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((8, s_pad), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, s_pad), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((RAY_ROWS, b), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=self.interpret,
        )(
            order,
            suffix,
            rays.reshape(nb * RAY_ROWS, b),
            jnp.asarray(tb.panel),
        )
        bt, bi = outs[0], outs[1]
        bt = bt.reshape(nb, 8, b)[:, 0].reshape(-1)[:n]
        bi = bi.reshape(nb, 8, b)[:, 0].reshape(-1)[:n]
        # Local slot id -> global triangle id (one tiny gather per chunk).
        found = bi != jnp.int32(0x7FFFFFFF)
        tri = jnp.asarray(tb.slot_to_tri)[jnp.where(found, bi, 0)]
        hit = found & (tri >= 0) & (bt <= t_max)
        if stats:
            steps = outs[2].reshape(nb, 8, b)[:, 0, 0]      # [NB]
            # Appended per chunk; the roofline probe (bench.py) resets the
            # list, runs eagerly, and sums the concrete values.
            if self._last_steps is None:
                self._last_steps = []
            self._last_steps.append(jnp.sum(steps))
        return hit, jnp.where(hit, bt, jnp.inf), jnp.maximum(tri, 0)

    def _chunked(self, o, d, t_max, any_hit):
        n = o.shape[0]
        if n <= self.ray_chunk and not self.sort_rays:
            return self._traverse_chunk(o, d, t_max, any_hit)
        order = None
        if self.sort_rays:
            if self._world_lo is None:  # from_tables: traced super boxes
                lo = jnp.min(jnp.asarray(self.tables.s_lo), axis=0)
                hi = jnp.max(jnp.asarray(self.tables.s_hi), axis=0)
                w_lo, w_inv = lo, 1.0 / jnp.maximum(hi - lo, 1e-12)
            else:
                w_lo = jnp.asarray(self._world_lo)
                w_inv = jnp.asarray(self._world_inv_extent)
            key = _sort_key(o, d, w_lo, w_inv)
            order = jnp.argsort(key)
            o, d, t_max = o[order], d[order], t_max[order]
        outs = []
        for s in range(0, n, self.ray_chunk):
            e = min(s + self.ray_chunk, n)
            outs.append(
                self._traverse_chunk(o[s:e], d[s:e], t_max[s:e], any_hit)
            )
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


def attach(scene, leaf_tris: int = 64, group: int = 8,
           max_prims_per_leaf: int = 4, block_rays: int = 512,
           ray_chunk: int = 16384, interpret: bool | None = None,
           pipeline: bool = False, certified: bool | None = None):
    """Install the Pallas sparse-sweep accelerator. ``interpret`` None ->
    auto: Mosaic on TPU, the Pallas interpreter elsewhere (CPU tests).
    ``certified`` defaults to the scene's exact_shared_edges setting."""
    if scene.n_triangles == 0:
        return scene
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if certified is None:
        certified = bool(getattr(scene, "exact_edges", False))
    tris = getattr(scene, "triangles_host", scene.triangles)
    accel = build_clusters(tris, leaf_tris, max_prims_per_leaf)
    scene.bump_version()
    scene.accel = PallasSweepAccelerator(
        accel, group=group, block_rays=block_rays, ray_chunk=ray_chunk,
        interpret=interpret, pipeline=pipeline, certified=certified,
    )
    return scene
