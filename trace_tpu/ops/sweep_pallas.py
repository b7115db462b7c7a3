"""Pallas per-ray-block sparse sweep — the hot-path traversal kernel.

The XLA cluster sweep (accel/clusters.py) uses ONE global demand order
for a whole 16-65k-ray chunk: every stage tests every lane, and a
semi-coherent chunk pays for the union of all its blocks' working sets.
This kernel gives each 512-ray block its OWN demand order and early-out,
with the whole per-stage pipeline fused in VMEM:

- Per block, XLA precomputes the demand-ordered super-cluster id list and
  the suffix-min of entry distances (both tiny: [NB, S]); they sit in
  SMEM for scalar control flow.
- The kernel walks the list with a device-side while loop: one DMA pulls
  the super's Moller-Trumbore constant panel [16, G*L] from HBM into
  VMEM, six [B,3] @ [3, G*L] MXU matmuls evaluate the whole
  (block x super) test grid, and the epilogue (sign fixup, u/v/t bounds,
  per-lane min + id select) never leaves VMEM — the [B, G*L] grid that
  the XLA sweep streams through HBM does not exist here.
- The block retires when the next suffix-min exceeds every live lane's
  best hit — the same conservative early-out as the cluster sweep
  (clusters.py:traverse), at block granularity.

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
from ..accel.mxu import mt_epilogue
from ..accel.clusters import ClusterAccel, build_clusters, _entry_boxes, \
    _sort_key

F32 = jnp.float32
RAY_ROWS = 16   # o(3) d(3) m(3) tmax(1) pad(6) -> one sublane tile


class SweepTables:
    """Host-packed kernel tables derived from a ClusterAccel."""

    def __init__(self, accel: ClusterAccel, group: int = 8):
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
        self.panel = np.asarray(
            np.pad(panel, ((0, 0), (0, 0), (0, self.gl_pad - gl))),
            np.float32,
        )
        # [S, 8, GL] — row 0 carries the ids, rows 1-7 pad the slab to the
        # int32 VMEM sublane tiling (Mosaic rejects 1-row DMA slices).
        tid_rows = np.full((s, 8, self.gl_pad), -1, np.int32)
        tid_rows[:, 0, :gl] = tid.reshape(s, gl)
        self.tid = np.ascontiguousarray(tid_rows)
        self.s_lo = np.ascontiguousarray(
            c_lo.reshape(s, g, 3).min(axis=1))
        self.s_hi = np.ascontiguousarray(
            c_hi.reshape(s, g, 3).max(axis=1))
        self.n_supers = s
        self.group = g
        self.leaf_tris = l


def _sweep_kernel(any_hit, n_supers,
                  idx_ref, suffix_ref,            # SMEM per block
                  rays_ref,                        # VMEM [16, B]
                  panel_hbm, tid_hbm,              # HBM full tables
                  bt_out, bi_out,                  # VMEM [1, B] outputs
                  panel_buf, tid_buf, sem, sem_i):
    b = rays_ref.shape[1]
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

    def body(state):
        s, best_t, best_i = state
        sid = idx_ref[0, s]
        cp = pltpu.make_async_copy(panel_hbm.at[sid], panel_buf, sem)
        ci = pltpu.make_async_copy(tid_hbm.at[sid], tid_buf, sem_i)
        cp.start()
        ci.start()
        cp.wait()
        ci.wait()

        n_p = panel_buf[0:3, :]
        e1_p = panel_buf[3:6, :]
        e2_p = panel_buf[6:9, :]
        w_p = panel_buf[9:12, :]
        q_p = panel_buf[12:15, :]
        v0n = panel_buf[15:16, :]                  # [1, GL]
        tid = tid_buf[0:1, :]                      # [1, GL]

        det = -mm(d_m, n_p)
        u_det = mm(m_m, e2_p) - mm(d_m, w_p)
        v_det = -mm(m_m, e1_p) - mm(d_m, q_p)
        t_det = mm(o_m, n_p) - v0n
        core_ok, t = mt_epilogue(det, u_det, v_det, t_det)
        limit = jnp.minimum(best_t, t_lim)[:, None]   # [B, 1]
        ok = core_ok & (t < limit) & (tid >= 0)
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
    _, best_t, best_i = jax.lax.while_loop(cond, body, init)
    found = best_i != jnp.int32(0x7FFFFFFF)
    # 8-sublane output blocks (Mosaic tile rule); row 0 carries the data.
    bt_out[:, :] = jnp.broadcast_to(
        jnp.where(found, best_t, jnp.inf)[None, :], bt_out.shape
    )
    bi_out[:, :] = jnp.broadcast_to(
        jnp.where(found, best_i, -1)[None, :], bi_out.shape
    )


def _sweep_kernel_pipelined(any_hit, n_supers,
                            idx_ref, suffix_ref,     # SMEM per block
                            rays_ref,                 # VMEM [16, B]
                            panel_hbm, tid_hbm,       # HBM full tables
                            bt_out, bi_out,           # VMEM [8, B] outputs
                            panel_buf, tid_buf, sem, sem_i):
    """Double-buffered variant of :func:`_sweep_kernel`: while the MXU
    evaluates super ``s``'s panel, the DMA engine already pulls super
    ``s+1``'s into the other buffer slot, hiding the HBM latency behind
    compute. Same demand order / suffix early-out / epilogue; the panel
    prefetched past the last executed step is drained after the loop
    (idx rows are zero-padded, so the overshoot index is always valid)."""
    b = rays_ref.shape[1]
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

    def start(slot, s):
        sid = idx_ref[0, s]
        pltpu.make_async_copy(
            panel_hbm.at[sid], panel_buf.at[slot], sem.at[slot]
        ).start()
        pltpu.make_async_copy(
            tid_hbm.at[sid], tid_buf.at[slot], sem_i.at[slot]
        ).start()

    def wait(slot):
        sid0 = idx_ref[0, 0]  # shape donor only; wait is by semaphore
        pltpu.make_async_copy(
            panel_hbm.at[sid0], panel_buf.at[slot], sem.at[slot]
        ).wait()
        pltpu.make_async_copy(
            tid_hbm.at[sid0], tid_buf.at[slot], sem_i.at[slot]
        ).wait()

    def body(state):
        s, best_t, best_i = state
        slot = jax.lax.rem(s, 2)
        # Prefetch s+1 into the other slot (its previous occupant was
        # consumed by iteration s-1). s+1 <= n_supers < s_pad: in-range,
        # and a zero pad id is a valid panel row.
        start(1 - slot, s + 1)
        wait(slot)

        n_p = panel_buf[slot, 0:3, :]
        e1_p = panel_buf[slot, 3:6, :]
        e2_p = panel_buf[slot, 6:9, :]
        w_p = panel_buf[slot, 9:12, :]
        q_p = panel_buf[slot, 12:15, :]
        v0n = panel_buf[slot, 15:16, :]
        tid = tid_buf[slot, 0:1, :]

        det = -mm(d_m, n_p)
        u_det = mm(m_m, e2_p) - mm(d_m, w_p)
        v_det = -mm(m_m, e1_p) - mm(d_m, q_p)
        t_det = mm(o_m, n_p) - v0n
        core_ok, t = mt_epilogue(det, u_det, v_det, t_det)
        limit = jnp.minimum(best_t, t_lim)[:, None]
        ok = core_ok & (t < limit) & (tid >= 0)
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


class PallasSweepAccelerator:
    """Scene accelerator driving the sparse sweep kernel (same interface
    as accel.clusters.ClusterAccelerator). Triangle tables live in HBM;
    per-block order/suffix tables are built by XLA per ray chunk."""

    def __init__(self, accel: ClusterAccel, group: int = 8,
                 block_rays: int = 512, ray_chunk: int = 16384,
                 sort_rays: bool = True, interpret: bool = False,
                 pipeline: bool = False):
        self.clusters = accel
        self.tables = SweepTables(accel, group)
        self.block_rays = int(block_rays)
        self.ray_chunk = int(ray_chunk)
        self.sort_rays = bool(sort_rays)
        self.interpret = bool(interpret)
        self.pipeline = bool(pipeline)
        lo = self.tables.s_lo.min(axis=0)
        hi = self.tables.s_hi.max(axis=0)
        self._world_lo = lo
        self._world_inv_extent = (
            1.0 / np.maximum(hi - lo, 1e-12)
        ).astype(np.float32)

    def refit(self, v0, v1, v2) -> None:
        """Refresh geometry for moved vertices with fixed topology: refit
        the underlying ClusterAccel, then repack the kernel tables (the
        kernel reads SweepTables, not the ClusterAccel — a refit that only
        swapped ``self.clusters`` would leave the kernel on stale
        geometry). Caller must scene.bump_version() afterwards."""
        from ..accel.clusters import refit_clusters

        self.clusters = refit_clusters(self.clusters, v0, v1, v2)
        self.tables = SweepTables(self.clusters, self.tables.group)
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
        if self.pipeline:
            kernel = functools.partial(
                _sweep_kernel_pipelined, any_hit, s_count
            )
            scratch = [
                pltpu.VMEM((2, 16, gl), jnp.float32),
                pltpu.VMEM((2, 8, gl), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            kernel = functools.partial(_sweep_kernel, any_hit, s_count)
            scratch = [
                pltpu.VMEM((16, gl), jnp.float32),
                pltpu.VMEM((8, gl), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ]
        bt, bi = pl.pallas_call(
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
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((8, b), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, b), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nb * 8, b), F32),
                jax.ShapeDtypeStruct((nb * 8, b), jnp.int32),
            ],
            scratch_shapes=scratch,
            interpret=self.interpret,
        )(
            order,
            suffix,
            rays.reshape(nb * RAY_ROWS, b),
            jnp.asarray(tb.panel),
            jnp.asarray(tb.tid),
        )
        bt = bt.reshape(nb, 8, b)[:, 0].reshape(-1)[:n]
        bi = bi.reshape(nb, 8, b)[:, 0].reshape(-1)[:n]
        hit = (bi >= 0) & (bt <= t_max)
        return hit, jnp.where(hit, bt, jnp.inf), jnp.maximum(bi, 0)

    def _chunked(self, o, d, t_max, any_hit):
        n = o.shape[0]
        if n <= self.ray_chunk and not self.sort_rays:
            return self._traverse_chunk(o, d, t_max, any_hit)
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
           pipeline: bool = False):
    """Install the Pallas sparse-sweep accelerator. ``interpret`` None ->
    auto: Mosaic on TPU, the Pallas interpreter elsewhere (CPU tests)."""
    if scene.n_triangles == 0:
        return scene
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tris = getattr(scene, "triangles_host", scene.triangles)
    accel = build_clusters(tris, leaf_tris, max_prims_per_leaf)
    scene.bump_version()
    scene.accel = PallasSweepAccelerator(
        accel, group=group, block_rays=block_rays, ray_chunk=ray_chunk,
        interpret=interpret, pipeline=pipeline,
    )
    return scene
