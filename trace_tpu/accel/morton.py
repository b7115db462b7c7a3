"""On-device accelerator build: Morton-ordered clustering (LBVH-style).

BASELINE.json's north star calls for BVH construction to move on-device
(Morton sort + hierarchy emit). For the cluster-sweep traversal
(accel/clusters.py) no explicit hierarchy is needed — only cluster AABBs
and packed triangle blocks — so the build collapses to exactly the LBVH
front half, all in jnp under jit:

1. 30-bit Morton codes of triangle centroids (bit-interleave, vectorized);
2. one argsort (the radix/Morton sort);
3. cut the sorted order into fixed-size blocks -> clusters; bounds are
   segment min/max reductions; Moller-Trumbore matmul constants are
   computed in the same pass.

Spatial quality is slightly below the SAH cut (Morton blocks can straddle
gaps), but the sweep's exactness does not depend on the cut — only its
speed does. Intended for per-frame rebuilds of animated geometry
(BASELINE config 5) where a host round-trip would dominate: the whole
build is device-resident and jit-compiled once.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .clusters import ClusterAccel

F32 = jnp.float32


def _expand_bits(v):
    """Spread the low 10 bits of v to every 3rd bit (Morton helper)."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_codes(p, lo, inv_extent):
    """30-bit Morton codes for points p [N,3] within [lo, lo+extent]."""
    q = jnp.clip((p - lo) * inv_extent, 0.0, 1.0 - 1e-7)
    g = (q * 1024.0).astype(jnp.uint32)
    return (
        (_expand_bits(g[:, 0]) << 2)
        | (_expand_bits(g[:, 1]) << 1)
        | _expand_bits(g[:, 2])
    )


@functools.partial(jax.jit, static_argnums=(3,))
def _build(v0, v1, v2, leaf_tris: int):
    t = v0.shape[0]
    pad = (-t) % leaf_tris
    big = jnp.float32(3e38)

    cent = (v0 + v1 + v2) / 3.0
    lo = jnp.min(cent, axis=0)
    hi = jnp.max(cent, axis=0)
    inv_extent = 1.0 / jnp.maximum(hi - lo, 1e-12)
    codes = morton_codes(cent, lo, inv_extent)
    order = jnp.argsort(codes).astype(jnp.int32)

    order_p = jnp.concatenate(
        [order, jnp.full((pad,), -1, jnp.int32)]
    )
    c = (t + pad) // leaf_tris
    tri_id = order_p.reshape(c, leaf_tris)
    safe = jnp.maximum(tri_id, 0)
    mask = (tri_id >= 0)[..., None]

    b0 = jnp.where(mask, v0[safe], 0.0)
    b1 = jnp.where(mask, v1[safe], 0.0)
    b2 = jnp.where(mask, v2[safe], 0.0)

    # Cluster AABBs: segment min/max over the block axis.
    lo_b = jnp.min(jnp.where(mask, jnp.minimum(jnp.minimum(b0, b1), b2), big),
                   axis=1)
    hi_b = jnp.max(jnp.where(mask, jnp.maximum(jnp.maximum(b0, b1), b2), -big),
                   axis=1)

    seg = leaf_tris * 3
    packed = jnp.concatenate(
        [b0.reshape(c, seg), b1.reshape(c, seg), b2.reshape(c, seg)], axis=1
    )
    p_pad = (-packed.shape[1]) % 128
    packed = jnp.pad(packed, ((0, 0), (0, p_pad)))

    # Moller-Trumbore matmul constants (same layout as build_clusters).
    e1 = b1 - b0
    e2 = b2 - b0
    nrm = jnp.cross(e1, e2)
    w = jnp.cross(e2, b0)
    q = jnp.cross(b0, e1)
    v0n = jnp.einsum("clj,clj->cl", b0, nrm)
    flat = lambda x: jnp.swapaxes(x, 1, 2).reshape(c, seg)
    packed_mt = jnp.concatenate(
        [flat(nrm), flat(e1), flat(e2), flat(w), flat(q), v0n], axis=1
    )
    mt_pad = (-packed_mt.shape[1]) % 128
    packed_mt = jnp.pad(packed_mt, ((0, 0), (0, mt_pad)))

    id_pad = (-leaf_tris) % 128
    tri_id_p = jnp.pad(tri_id, ((0, 0), (0, id_pad)), constant_values=-1)
    return lo_b, hi_b, packed, packed_mt, tri_id_p


def build_clusters_device(tris, leaf_tris: int = 32) -> ClusterAccel:
    """Fully on-device cluster build from a Triangles SoA (single-level:
    super_size 1, so s_lo/s_hi alias the cluster boxes and are unused by
    traverse)."""
    lo_b, hi_b, packed, packed_mt, tri_id = _build(
        tris.v0, tris.v1, tris.v2, leaf_tris
    )
    return ClusterAccel(lo_b, hi_b, lo_b, hi_b, packed, packed_mt, tri_id,
                        leaf_tris, 1)


def attach(scene, leaf_tris: int = 32, stage_clusters: int = 64,
           ray_chunk: int = 16384):
    """Install a Morton-built cluster accelerator (device build)."""
    if scene.n_triangles == 0:
        return scene
    from .clusters import ClusterAccelerator

    accel = build_clusters_device(
        getattr(scene, "triangles_host", scene.triangles), leaf_tris)
    scene.bump_version()
    scene.accel = ClusterAccelerator(accel, stage_clusters, ray_chunk)
    return scene
