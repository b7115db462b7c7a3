"""Pallas packet-traversal kernel — the hot-path BVH for TPU.

Classic packet tracing mapped onto the TPU's execution model: a block of
1024 rays (one [8, 128] VPU tile per SoA component) traverses a shallow
BVH built over triangle clusters with ONE shared scalar stack per block.
Control flow (node visits, push/pop) is scalar and runs on the scalar
unit; AABB slab tests and watertight triangle tests are dense [8, 128]
vector ops on the whole packet. All scene data — cluster-tree nodes and
packed triangle blocks — is VMEM-resident, so a node visit costs zero HBM
traffic.

This replaces both failed XLA formulations (measured on v5e):
per-lane vmapped stack traversal (gathers explode at compile time) and
dense demand-ordered sweeps (no per-lane early-out -> brute-force work).
The packet kernel gives the reference's early-out economics
(/root/reference/src/accel/bvh.jl:212-299) with TPU-shaped math.

Capacity: scene data must fit in VMEM (~10 MB -> about 150k triangles).
Larger scenes fall back to the cluster sweep (accel/clusters.py).

STATUS: exact in interpret mode (tests/test_accel_equivalence.py); on the
real chip Mosaic currently rejects the scalar node-metadata reads from
VMEM ("index in dimension 1 must be a multiple of 128") — node metadata
must move to SMEM (scalar memory) and leaf vertex reads to tile-aligned
vector loads. Until that rework lands the default accelerator is the
MXU cluster sweep; this kernel is not wired into SceneBuilder.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..shapes import sphere as sph_mod
from .bvh import build_bvh
from .clusters import ClusterAccel, build_clusters

F32 = jnp.float32
RAYS_PER_BLOCK = 1024  # one (8, 128) tile per SoA component
SUB, LANES = 8, 128
STACK_DEPTH = 64


def _build_cluster_tree(accel: ClusterAccel):
    """SAH BVH over cluster AABBs -> SoA node arrays transposed for
    lane-friendly scalar reads: nodes_f [8, M] rows lo.xyz|hi.xyz|pad,
    nodes_i [4, M] rows is_leaf | payload | axis | pad (payload = cluster
    id for leaves, right-child index for interiors; first child = i+1)."""
    c_bounds = np.stack(
        [np.asarray(accel.c_lo), np.asarray(accel.c_hi)], axis=1
    )
    tree = build_bvh(c_bounds, max_prims_per_leaf=1)
    m = tree.lo.shape[0]
    lo = np.asarray(tree.lo)
    hi = np.asarray(tree.hi)
    n_prims = np.asarray(tree.n_prims)
    right = np.asarray(tree.right_child)
    start = np.asarray(tree.prim_start)
    order = np.asarray(tree.prim_order)
    axis = np.asarray(tree.axis)

    m_pad = -(-m // LANES) * LANES
    nodes_f = np.zeros((8, m_pad), np.float32)
    nodes_f[0:3, :m] = lo.T
    nodes_f[3:6, :m] = hi.T
    nodes_i = np.zeros((4, m_pad), np.int32)
    is_leaf = n_prims > 0
    # max_prims_per_leaf=1 guarantees exactly one cluster per leaf.
    assert np.all(n_prims[is_leaf] == 1)
    payload = np.where(is_leaf, order[np.minimum(start, len(order) - 1)], right)
    nodes_i[0, :m] = is_leaf.astype(np.int32)
    nodes_i[1, :m] = payload
    nodes_i[2, :m] = axis
    return np.asarray(nodes_f), np.asarray(nodes_i)


def _packet_kernel(leaf_tris, any_hit,
                   ox, oy, oz, dx, dy, dz, tmax_ref,
                   nodes_f, nodes_i, packed, tid_ref,
                   bt_out, bi_out, stack):
    l = leaf_tris
    seg = l * 3
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    inv_dx = 1.0 / dx[:]
    inv_dy = 1.0 / dy[:]
    inv_dz = 1.0 / dz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    t_lim = tmax_ref[:]

    # Watertight-permutation data per lane (triangle_mesh.jl:99-123
    # semantics, vectorized over the packet).
    adx, ady, adz = jnp.abs(d_x), jnp.abs(d_y), jnp.abs(d_z)
    kz_is_x = (adx >= ady) & (adx >= adz)
    kz_is_y = (~kz_is_x) & (ady >= adz)
    kz_is_z = ~(kz_is_x | kz_is_y)

    def permute(vx, vy, vz):
        # (x, y, z) -> (kx, ky, kz) with kz the dominant axis.
        pz = jnp.where(kz_is_x, vx, jnp.where(kz_is_y, vy, vz))
        px = jnp.where(kz_is_x, vy, jnp.where(kz_is_y, vz, vx))
        py = jnp.where(kz_is_x, vz, jnp.where(kz_is_y, vx, vy))
        return px, py, pz

    pdx, pdy, pdz = permute(d_x, d_y, d_z)
    inv_pdz = 1.0 / pdz
    sx = -pdx * inv_pdz
    sy = -pdy * inv_pdz

    def tri_test(v0, v1, v2, best_t):
        """One triangle (9 scalars) vs the whole packet -> (hit, t)."""
        def shear(v):
            tx, ty, tz = permute(v[0] - o_x, v[1] - o_y, v[2] - o_z)
            return tx + sx * tz, ty + sy * tz, tz

        x0, y0, z0 = shear(v0)
        x1, y1, z1 = shear(v1)
        x2, y2, z2 = shear(v2)
        e0 = x1 * y2 - y1 * x2
        e1 = x2 * y0 - y2 * x0
        e2 = x0 * y1 - y0 * x1
        mixed = ((e0 < 0) | (e1 < 0) | (e2 < 0)) & ((e0 > 0) | (e1 > 0) | (e2 > 0))
        det = e0 + e1 + e2
        t_scaled = (e0 * z0 + e1 * z1 + e2 * z2) * inv_pdz
        inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
        t = t_scaled * inv_det
        ok = (
            ~mixed & (det != 0.0)
            & (t > 0.0) & (t < best_t)
        )
        return ok, t

    def slab_any(node, best_t):
        lo_x = nodes_f[0, node]
        lo_y = nodes_f[1, node]
        lo_z = nodes_f[2, node]
        hi_x = nodes_f[3, node]
        hi_y = nodes_f[4, node]
        hi_z = nodes_f[5, node]
        t0x = (lo_x - o_x) * inv_dx
        t1x = (hi_x - o_x) * inv_dx
        t0y = (lo_y - o_y) * inv_dy
        t1y = (hi_y - o_y) * inv_dy
        t0z = (lo_z - o_z) * inv_dz
        t1z = (hi_z - o_z) * inv_dz
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        ) * 1.00000024
        hit = (near <= far) & (far > 0.0) & (near < best_t)
        return jnp.any(hit)

    def leaf_test(cid, best_t, best_i, done_any):
        def tri_step(k, acc):
            bt, bi, da = acc
            base = 3 * k
            v0 = (packed[cid, 0 * seg + base], packed[cid, 0 * seg + base + 1],
                  packed[cid, 0 * seg + base + 2])
            v1 = (packed[cid, 1 * seg + base], packed[cid, 1 * seg + base + 1],
                  packed[cid, 1 * seg + base + 2])
            v2 = (packed[cid, 2 * seg + base], packed[cid, 2 * seg + base + 1],
                  packed[cid, 2 * seg + base + 2])
            gid = tid_ref[cid, k]
            ok, t = tri_test(v0, v1, v2, bt)
            ok = ok & (gid >= 0)
            bt = jnp.where(ok, t, bt)
            bi = jnp.where(ok, gid, bi)
            if any_hit:
                da = da | ok
            return bt, bi, da

        return jax.lax.fori_loop(
            0, l, tri_step, (best_t, best_i, done_any)
        )

    def cond(state):
        node, sp, best_t, best_i, found = state
        alive = node >= 0
        if any_hit:
            alive = alive & ~jnp.all(found)
        return alive

    def body(state):
        node, sp, best_t, best_i, found = state
        box = slab_any(node, jnp.where(found, -jnp.inf, best_t) if any_hit else best_t)
        is_leaf = nodes_i[0, node] == 1
        payload = nodes_i[1, node]

        best_t, best_i, found = jax.lax.cond(
            box & is_leaf,
            lambda: leaf_test(payload, best_t, best_i, found),
            lambda: (best_t, best_i, found),
        )

        descend = box & ~is_leaf
        # Push the far child (front-to-back by the packet's mean direction
        # sign on the split axis).
        axis = nodes_i[2, node]
        d_mean = jax.lax.switch(
            axis,
            [lambda: jnp.sum(d_x), lambda: jnp.sum(d_y), lambda: jnp.sum(d_z)],
        )
        neg = d_mean < 0.0
        near = jnp.where(neg, payload, node + 1)
        far = jnp.where(neg, node + 1, payload)

        push = descend & (sp < STACK_DEPTH)
        slot = jnp.minimum(sp, STACK_DEPTH - 1)

        @pl.when(push)
        def _():
            stack[slot] = far

        sp2 = jnp.where(push, sp + 1, sp)
        pop_sp = jnp.maximum(sp2 - 1, 0)
        popped = jnp.where(sp2 > 0, stack[pop_sp], -1)
        node2 = jnp.where(descend, near, popped)
        sp3 = jnp.where(descend, sp2, pop_sp)
        return (node2, sp3, best_t, best_i, found)

    init = (
        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
        t_lim, jnp.full((SUB, LANES), -1, jnp.int32),
        jnp.zeros((SUB, LANES), bool),
    )
    _, _, best_t, best_i, _ = jax.lax.while_loop(cond, body, init)
    bt_out[:] = jnp.where(best_i >= 0, best_t, jnp.inf)
    bi_out[:] = best_i


class PacketAccelerator:
    """Scene accelerator driving the Pallas packet kernel."""

    def __init__(self, accel: ClusterAccel, interpret: bool = False):
        self.clusters = accel
        self.nodes_f, self.nodes_i = _build_cluster_tree(accel)
        self.interpret = interpret

    def _traverse(self, o, d, t_max, any_hit):
        n = o.shape[0]
        pad = (-n) % RAYS_PER_BLOCK
        npad = n + pad
        blocks = npad // RAYS_PER_BLOCK

        def tile(x):
            x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
            return x.reshape(blocks * SUB, LANES, *x.shape[1:])

        o_p, d_p = tile(o), tile(d)
        # Zero-length directions on padded lanes -> harmless NaN, masked.
        t_p = tile(jnp.where(jnp.isfinite(t_max), t_max, 3.0e38))

        soa = [o_p[..., 0], o_p[..., 1], o_p[..., 2],
               d_p[..., 0], d_p[..., 1], d_p[..., 2], t_p]
        ray_spec = pl.BlockSpec(
            (SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _packet_kernel, self.clusters.leaf_tris, any_hit
        )
        bt, bi = pl.pallas_call(
            kernel,
            grid=(blocks,),
            in_specs=[ray_spec] * 7 + [full] * 4,
            out_specs=[ray_spec, ray_spec],
            out_shape=[
                jax.ShapeDtypeStruct((blocks * SUB, LANES), F32),
                jax.ShapeDtypeStruct((blocks * SUB, LANES), jnp.int32),
            ],
            scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
            interpret=self.interpret,
        )(*soa, self.nodes_f, self.nodes_i,
          self.clusters.packed, self.clusters.tri_id)
        bt = bt.reshape(-1)[:n]
        bi = bi.reshape(-1)[:n]
        hit = (bi >= 0) & (bt <= t_max)
        return hit, jnp.where(hit, bt, jnp.inf), jnp.maximum(bi, 0)

    def closest(self, scene, o, d, t_max):
        n = o.shape[0]
        no_hit = (jnp.zeros(n, bool), jnp.full(n, jnp.inf, F32),
                  jnp.zeros(n, jnp.int32))
        hs = (
            sph_mod.intersect_closest(scene.spheres, o, d, t_max)
            if scene.n_spheres else no_hit
        )
        ht = (
            self._traverse(o, d, t_max, False)
            if scene.n_triangles else no_hit
        )
        return hs, ht

    def any_hit(self, scene, o, d, t_max):
        n = o.shape[0]
        occ = jnp.zeros(n, bool)
        if scene.n_spheres:
            occ = occ | sph_mod.intersect_p(scene.spheres, o, d, t_max)
        if scene.n_triangles:
            h, t, _ = self._traverse(o, d, t_max, True)
            occ = occ | (h & (t <= t_max))
        return occ


VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def attach(scene, leaf_tris: int = 32, max_prims_per_leaf: int = 4,
           interpret: bool = False):
    """Install the packet accelerator (falls back to the cluster sweep
    when the scene exceeds the VMEM budget)."""
    if scene.n_triangles == 0:
        return scene
    tris = getattr(scene, "triangles_host", scene.triangles)
    accel = build_clusters(tris, leaf_tris, max_prims_per_leaf)
    data_bytes = accel.packed.size * 4 + accel.tri_id.size * 4
    if data_bytes > VMEM_BUDGET_BYTES:
        from .clusters import ClusterAccelerator

        scene.bump_version()
        scene.accel = ClusterAccelerator(accel)
        return scene
    scene.bump_version()
    scene.accel = PacketAccelerator(accel, interpret=interpret)
    return scene
