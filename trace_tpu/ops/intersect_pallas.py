"""Fused MXU ray-triangle intersection (Pallas).

The XLA version of the matmul-factored Moller-Trumbore test (accel/mxu.py)
materializes four [rays, tris] matrices in HBM per chunk — measured
bandwidth-bound at ~13 Gpairs/s on v5e. This kernel fuses the whole
pipeline flash-attention-style: one [1024, 16] ray block against one
128-triangle block per grid step computes

    O = A @ B    # [1024, 5*128]: det | u*det | v*det | t*det | tri_id

on the MXU (triangle ids ride a constant-1 column of A, so they broadcast
through the same matmul), then the sign logic, validity masks and the
per-ray running (best_t, best_id) min-merge all happen in VMEM. Nothing
[rays x tris]-shaped ever leaves the chip.

Layouts (host-side packers below):
  A  [N, 16]   per ray:  o | d | o x d | 1 | 0-pad
  B  [16, (T/128)*640] per 128-tri block, 5 column groups of 128:
       det:  rows 3:6 = -n
       u:    rows 6:9 = e2, rows 3:6 = -w        (w = e2 x v0)
       v:    rows 6:9 = -e1, rows 3:6 = -q       (q = v0 x e1)
       t:    rows 0:3 = n,  row 9 = -(v0 . n)
       id:   row 9 = triangle id (exact in f32 for T < 2^24)
Padding triangles carry id -1 and all-zero geometry -> never valid.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.mxu import mt_epilogue

F32 = jnp.float32
RAY_BLOCK = 1024
TRI_BLOCK = 128
GROUPS = 5  # det, u, v, t, id


def pack_rays(o, d, t_max):
    """[N,3]x3 -> (A [Np, 16], t_max [Np, 1], n_pad). Pads N to RAY_BLOCK."""
    n = o.shape[0]
    pad = (-n) % RAY_BLOCK
    o = jnp.pad(o, ((0, pad), (0, 0)))
    d = jnp.pad(d, ((0, pad), (0, 0)))
    t_max = jnp.pad(t_max, (0, pad))
    m = jnp.cross(o, d)
    ones = jnp.ones((n + pad, 1), F32)
    zeros = jnp.zeros((n + pad, 6), F32)
    a = jnp.concatenate([o, d, m, ones, zeros], axis=1)
    return a, t_max[:, None], pad


def pack_tris(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
              tri_id: np.ndarray | None = None) -> jnp.ndarray:
    """Triangle arrays [T,3] -> B [16, ceil(T/128)*640] (numpy, host)."""
    t = v0.shape[0]
    pad = (-t) % TRI_BLOCK
    ids = (np.arange(t, dtype=np.float64) if tri_id is None
           else np.asarray(tri_id, np.float64))

    def padv(x):
        return np.pad(np.asarray(x, np.float64), ((0, pad), (0, 0)))

    v0p, v1p, v2p = padv(v0), padv(v1), padv(v2)
    idsp = np.pad(ids, (0, pad), constant_values=-1.0)
    e1 = v1p - v0p
    e2 = v2p - v0p
    nrm = np.cross(e1, e2)
    w = np.cross(e2, v0p)
    q = np.cross(v0p, e1)
    v0n = np.einsum("ij,ij->i", v0p, nrm)

    tp = t + pad
    nb = tp // TRI_BLOCK
    b = np.zeros((16, nb, GROUPS, TRI_BLOCK), np.float64)
    blk = lambda x: x.reshape(nb, TRI_BLOCK, 3).transpose(2, 0, 1)
    b[3:6, :, 0] = -blk(nrm)
    b[6:9, :, 1] = blk(e2)
    b[3:6, :, 1] = -blk(w)
    b[6:9, :, 2] = -blk(e1)
    b[3:6, :, 2] = -blk(q)
    b[0:3, :, 3] = blk(nrm)
    b[9, :, 3] = -v0n.reshape(nb, TRI_BLOCK)
    b[9, :, 4] = idsp.reshape(nb, TRI_BLOCK)
    # Host numpy (device consts d2h at jit trace — relay poison).
    return np.ascontiguousarray(b.reshape(16, nb * GROUPS * TRI_BLOCK), dtype=np.float32)


def _kernel(a_ref, b_ref, tmax_ref, bt_ref, bi_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        bt_ref[:] = jnp.full_like(bt_ref, jnp.inf)
        bi_ref[:] = jnp.full_like(bi_ref, -1.0)

    o = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    det = o[:, 0 * TRI_BLOCK:1 * TRI_BLOCK]
    u_d = o[:, 1 * TRI_BLOCK:2 * TRI_BLOCK]
    v_d = o[:, 2 * TRI_BLOCK:3 * TRI_BLOCK]
    t_d = o[:, 3 * TRI_BLOCK:4 * TRI_BLOCK]
    tid = o[:, 4 * TRI_BLOCK:5 * TRI_BLOCK]

    core_ok, t = mt_epilogue(det, u_d, v_d, t_d)
    valid = core_ok & (t < tmax_ref[:]) & (tid >= 0.0)
    t = jnp.where(valid, t, jnp.inf)
    row_min = jnp.min(t, axis=1, keepdims=True)            # [1024, 1]
    row_id = jnp.min(
        jnp.where(t == row_min, tid, 3.0e38), axis=1, keepdims=True
    )

    better = row_min < bt_ref[:]
    bt_ref[:] = jnp.where(better, row_min, bt_ref[:])
    bi_ref[:] = jnp.where(better, row_id, bi_ref[:])


@functools.partial(jax.jit, static_argnums=(3,))
def intersect_fused(a, b, t_max_col, interpret: bool = False):
    """Run the fused kernel. a: [Np, 16]; b: [16, NB*640];
    t_max_col: [Np, 1]. Returns (best_t [Np], best_id [Np] int32, -1=miss).
    """
    n = a.shape[0]
    nb_tri = b.shape[1] // (GROUPS * TRI_BLOCK)
    grid = (n // RAY_BLOCK, nb_tri)
    bt, bi = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 16), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, GROUPS * TRI_BLOCK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), F32),
            jax.ShapeDtypeStruct((n, 1), F32),
        ],
        interpret=interpret,
    )(a, b, t_max_col)
    best_t = bt[:, 0]
    best_i = bi[:, 0]
    hit = (best_i >= 0.0) & jnp.isfinite(best_t)
    return (
        jnp.where(hit, best_t, jnp.inf),
        jnp.where(hit, best_i, -1.0).astype(jnp.int32),
    )


class PallasMXUAccelerator:
    """Scene accelerator over the fused kernel (brute-force sweep; the
    cluster cull can feed it per-stage later)."""

    def __init__(self, tris, interpret: bool = False):
        self.b = pack_tris(
            np.asarray(tris.v0), np.asarray(tris.v1), np.asarray(tris.v2)
        )
        self.interpret = interpret

    def traverse(self, o, d, t_max):
        a, tcol, pad = pack_rays(o, d, t_max)
        bt, bi = intersect_fused(a, self.b, tcol, self.interpret)
        n = o.shape[0]
        bt, bi = bt[:n], bi[:n]
        hit = bi >= 0
        return hit, jnp.where(hit, bt, jnp.inf), jnp.maximum(bi, 0)

    def closest(self, scene, o, d, t_max):
        from ..shapes import sphere as sph_mod

        n = o.shape[0]
        no_hit = (jnp.zeros(n, bool), jnp.full(n, jnp.inf, F32),
                  jnp.zeros(n, jnp.int32))
        hs = (
            sph_mod.intersect_closest(scene.spheres, o, d, t_max)
            if scene.n_spheres else no_hit
        )
        ht = self.traverse(o, d, t_max) if scene.n_triangles else no_hit
        return hs, ht

    def any_hit(self, scene, o, d, t_max):
        from ..shapes import sphere as sph_mod

        n = o.shape[0]
        occ = jnp.zeros(n, bool)
        if scene.n_spheres:
            occ = occ | sph_mod.intersect_p(scene.spheres, o, d, t_max)
        if scene.n_triangles:
            h, t, _ = self.traverse(o, d, t_max)
            occ = occ | (h & (t <= t_max))
        return occ


def attach(scene, interpret: bool = False):
    if scene.n_triangles == 0:
        return scene
    scene.bump_version()
    scene.accel = PallasMXUAccelerator(
        getattr(scene, "triangles_host", scene.triangles), interpret=interpret)
    return scene
