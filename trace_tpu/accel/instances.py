"""Two-level instanced geometry: many transformed copies of one base mesh
sharing a single acceleration structure.

TPU-native counterpart of the reference's nested-BVH capability — there a
``BVHAccel`` is itself a ``Primitive`` so trees compose
(/root/reference/src/accel/bvh.jl:50-68, exercised by
test/test_intersection.jl:129-156). The wavefront analog keeps the base
mesh ONCE in object space (one cluster accel over it) plus a small
per-instance transform table, and traverses instances exactly like the
cluster sweep traverses leaf clusters one level down
(accel/clusters.py:traverse):

1. One [N, I] slab pass gives every ray's entry distance to every
   instance's world AABB.
2. Instances are demand-ordered; the sweep visits them one at a time,
   transforming the whole ray batch into the instance's object space
   (the direction stays UNNORMALIZED, so object-space t == world t) and
   running the shared base-mesh traversal.
3. A lane retires when the minimum entry distance over all unvisited
   instances (suffix-min over the demand order) exceeds its best hit —
   the same exactness argument as the cluster sweep: worst case degrades
   to testing every instance, never to dropped hits.

Memory: O(base mesh + I transforms) instead of O(I x base mesh) — 100
instances of the 88k-triangle caustic glass cost one glass plus a [100,4,4]
table.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.pytree import pytree, replace
from ..core import math as m
from ..shapes import triangle as tri_mod
from .clusters import ClusterAccel, build_clusters, traverse

F32 = jnp.float32


@pytree
class InstanceTable:
    o2w: jnp.ndarray          # [I, 4, 4] object->world
    w2o: jnp.ndarray          # [I, 4, 4] world->object
    lo: jnp.ndarray           # [I, 3] world AABB of the transformed mesh
    hi: jnp.ndarray           # [I, 3]
    material_id: jnp.ndarray  # [I] int32; -1 = keep base-mesh materials
    swaps: jnp.ndarray        # [I] bool: transform swaps handedness


class InstancedGeometry:
    """One base mesh + its instance table + the shared accelerator."""

    def __init__(self, base: tri_mod.Triangles, table: InstanceTable,
                 stage_clusters: int = 64, leaf_tris: int = 32,
                 use_accel: bool | None = None):
        self.base = base                      # object-space Triangles (host)
        self.table = table                    # host numpy leaves
        self.n_base = tri_mod.num_triangles(base)
        self.n_instances = int(np.asarray(table.o2w).shape[0])
        self.stage_clusters = int(stage_clusters)
        if use_accel is None:
            use_accel = self.n_base > 64
        self.accel: ClusterAccel | None = (
            build_clusters(base, leaf_tris) if use_accel else None
        )

    def world_bounds_np(self) -> np.ndarray:
        """[1, 2, 3] overall world bound (for scene bounds/lights)."""
        lo = np.asarray(self.table.lo).min(axis=0)
        hi = np.asarray(self.table.hi).max(axis=0)
        return np.stack([lo, hi])[None]

    # Uniform instanced-geometry interface (shared with InstancedSpheres).
    def traverse(self, o, d, t_max, any_hit: bool = False):
        return instanced_traverse(self, o, d, t_max, any_hit)

    def make_hit_record(self, o, d, time, elem_idx, inst_idx, valid,
                        prim_offset: int = 0):
        return make_instanced_hit(self, o, d, time, elem_idx, inst_idx,
                                  valid, prim_offset)


def _transform_aabb(o2w: np.ndarray, lo, hi):
    """World AABB of an object-space AABB under an affine map (the 8-corner
    bound, transformations.jl:141-143 semantics)."""
    corners = np.array(
        [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
         for z in (lo[2], hi[2])], np.float32,
    )
    w = corners @ o2w[:3, :3].T + o2w[:3, 3]
    return w.min(axis=0), w.max(axis=0)


def build_instances(
    indices, vertices, transforms, material_id: int = 0,
    normals=None, uv=None, material_ids=None,
    stage_clusters: int = 64, leaf_tris: int = 32,
) -> InstancedGeometry:
    """Pack the base mesh ONCE in object space and derive the instance
    table from the transform list (core.transform.Transform objects)."""
    from ..core import transform as T

    base = tri_mod.pack_triangle_mesh(
        T.identity(), indices, vertices, normals=normals, uv=uv,
        material_id=material_id,
    )
    bounds = tri_mod.world_bounds_np(base)
    b_lo = bounds[:, 0].min(axis=0)
    b_hi = bounds[:, 1].max(axis=0)

    n_i = len(transforms)
    o2w = np.stack([np.asarray(t.m, np.float32) for t in transforms])
    w2o = np.stack([np.asarray(t.inv_m, np.float32) for t in transforms])
    lo = np.zeros((n_i, 3), np.float32)
    hi = np.zeros((n_i, 3), np.float32)
    for i in range(n_i):
        lo[i], hi[i] = _transform_aabb(o2w[i], b_lo, b_hi)
    swaps = np.array(
        [np.linalg.det(mm[:3, :3]) < 0 for mm in o2w], bool
    )
    if material_ids is None:
        mat = np.full(n_i, -1, np.int32)
    else:
        mat = np.asarray(material_ids, np.int32)
    table = InstanceTable(o2w, w2o, lo, hi, mat, swaps)
    return InstancedGeometry(base, table, stage_clusters, leaf_tris)


# ---------------------------------------------------------------------------
# Traversal
# ---------------------------------------------------------------------------

def _instance_entry(lo, hi, o, d, t_max):
    """Slab entry distance per (ray, instance) world AABB: [N, I].
    Same robustness rules as every other box sweep (shared helper)."""
    from .clusters import _entry_boxes

    return _entry_boxes(lo, hi, o, d, t_max)


def _apply44_point(m44, p):
    """[4,4] (traced) applied to [N, 3] points, exact f32 (no MXU bf16)."""
    return m.mat3_apply(m44[:3, :3], p) + m44[:3, 3]


def _sweep_instances(table: InstanceTable, n_i: int, inner, o, d, t_max,
                     any_hit: bool):
    """Generic demand-ordered instance sweep, shared by every base-shape
    kind (the two-level analog of the cluster sweep's demand order +
    suffix-min early-out). ``inner(o_l, d_l, limit) -> (hit, t, elem)``
    is the base-shape closest-hit in instance-local space; directions are
    passed UNNORMALIZED so t_local == t_world. Returns (hit [N] bool,
    t [N], elem [N] int32 base-shape element id, inst [N] int32)."""
    n = o.shape[0]
    entry = _instance_entry(table.lo, table.hi, o, d, t_max)   # [N, I]
    demand = jnp.sum(jnp.isfinite(entry), axis=0)
    perm = jnp.argsort(-demand).astype(jnp.int32)              # [I]
    entry_g = jnp.take(entry, perm, axis=1)
    suffix = jax.lax.associative_scan(
        jnp.minimum, entry_g, reverse=True, axis=1
    )
    suffix = jnp.pad(suffix, ((0, 0), (0, 1)), constant_values=jnp.inf)

    def cond(state):
        r, best_t, best_elem, best_inst, done = state
        return (r < n_i) & ~jnp.all(done)

    def body(state):
        r, best_t, best_elem, best_inst, done = state
        inst = perm[r]
        w2o = jnp.take(table.w2o, inst, axis=0)                # [4, 4]
        o_l = _apply44_point(w2o, o)
        d_l = m.mat3_apply(w2o[:3, :3], d)  # unnormalized: t_local == t_world
        limit = jnp.where(done, F32(-jnp.inf), jnp.minimum(best_t, t_max))
        hit, t, elem = inner(o_l, d_l, limit)
        better = hit & (t < best_t)
        best_t = jnp.where(better, t, best_t)
        best_elem = jnp.where(better, elem, best_elem)
        best_inst = jnp.where(better, inst, best_inst)
        if any_hit:
            done = done | (best_t <= t_max)
        nxt = jax.lax.dynamic_slice(suffix, (0, r + 1), (n, 1))[:, 0]
        done = done | (nxt >= jnp.minimum(best_t, t_max))
        return (r + 1, best_t, best_elem, best_inst, done)

    # Initial carries derived from the (possibly shard_map-varying) rays:
    # fresh jnp.full/zeros constants are UNVARYING and trip the vma check
    # when the loop body writes varying values into them (see
    # integrators.common.vary_like — same rule).
    zeros = o[:, 0] * 0.0                       # [N], inherits varying axes
    state = (
        jnp.asarray(0, jnp.int32),
        zeros + jnp.inf,
        zeros.astype(jnp.int32),
        zeros.astype(jnp.int32) - 1,
        zeros > 0.0,
    )
    _, best_t, best_elem, best_inst, _ = jax.lax.while_loop(cond, body, state)
    hit = (best_inst >= 0) & (best_t <= t_max)
    return (hit, jnp.where(hit, best_t, jnp.inf), best_elem,
            jnp.maximum(best_inst, 0))


def instanced_traverse(geom: InstancedGeometry, o, d, t_max,
                       any_hit: bool = False):
    """Demand-ordered instance sweep over a mesh base. Returns (hit [N]
    bool, t [N], tri [N] int32 base-mesh triangle id, inst [N] int32)."""
    table = jax.tree.map(jnp.asarray, geom.table)
    accel = (
        jax.tree.map(jnp.asarray, geom.accel)
        if geom.accel is not None else None
    )
    base = jax.tree.map(jnp.asarray, geom.base)

    if accel is not None:
        def inner(o_l, d_l, limit):
            return traverse(
                accel, o_l, d_l, limit, geom.stage_clusters, any_hit
            )
    else:
        def inner(o_l, d_l, limit):
            h_all, t_all = tri_mod.intersect_all(base, o_l, d_l, limit)
            t_all = jnp.where(h_all, t_all, jnp.inf)
            tri = jnp.argmin(t_all, axis=-1).astype(jnp.int32)
            t = jnp.min(t_all, axis=-1)
            return jnp.isfinite(t), t, tri

    return _sweep_instances(table, geom.n_instances, inner, o, d, t_max,
                            any_hit)


# ---------------------------------------------------------------------------
# Detail phase: object-space hit record -> world space
# ---------------------------------------------------------------------------

def make_instanced_hit(geom: InstancedGeometry, o, d, time, tri_idx,
                       inst_idx, valid, prim_offset: int = 0):
    """Winner detail phase. The base-mesh record is built in OBJECT space
    (reusing triangle.make_hit on per-lane-transformed rays) and mapped to
    world: points/tangents by o2w, normals by the inverse transpose
    (w2o^T — the Normal3f covariance rule, transformations.jl:140),
    flipped where the instance transform swaps handedness."""
    table = jax.tree.map(jnp.asarray, geom.table)
    g = lambda x: jnp.take(x, inst_idx, axis=0)
    w2o = g(table.w2o)                                         # [N, 4, 4]
    o2w = g(table.o2w)
    o_l = m.mat3_apply(w2o[..., :3, :3], o) + w2o[..., :3, 3]
    d_l = m.mat3_apply(w2o[..., :3, :3], d)

    rec = tri_mod.make_hit(geom.base, o_l, d_l, time, tri_idx, valid,
                           prim_offset=0)

    to_w_p = lambda p: m.mat3_apply(o2w[..., :3, :3], p) + o2w[..., :3, 3]
    to_w_v = lambda v: m.mat3_apply(o2w[..., :3, :3], v)
    to_w_n = lambda nn: m.mat3_apply_t(w2o[..., :3, :3], nn)
    # Handedness: for cross-product (geometric) normals the inverse
    # transpose already lands on the correct side — cross(Av x Aw) =
    # det(A) A^-T cross(v,w), and the reference's baked-mesh flip
    # (triangle_mesh pack: flip = reverse ^ swaps) exactly cancels that
    # det sign. Per-VERTEX shading normals transform covariantly with no
    # det factor, and the reference flips them on handedness swap
    # (surface_interaction.jl:70-88 reverse_xor_swaps) — so the flip
    # applies only where the base triangle carries vertex normals.
    has_n = jnp.take(jnp.asarray(geom.base.has_normals), tri_idx, axis=0)
    flip = (g(table.swaps) & has_n)[..., None]
    nrm = lambda nn: jnp.where(
        flip, -1.0, 1.0
    ) * m.normalize(to_w_n(nn))

    rec = replace(
        rec,
        p=to_w_p(rec.p),
        n=nrm(rec.n),
        ns=nrm(rec.ns),
        wo=m.normalize(-d),
        s_dpdu=to_w_v(rec.s_dpdu),
        s_dpdv=to_w_v(rec.s_dpdv),
        s_dndu=to_w_n(rec.s_dndu),
        s_dndv=to_w_n(rec.s_dndv),
        prim_id=(prim_offset + inst_idx * geom.n_base + tri_idx).astype(
            jnp.int32
        ),
    )
    inst_mat = g(table.material_id)
    rec = replace(
        rec,
        material_id=jnp.where(
            inst_mat >= 0, inst_mat, rec.material_id
        ).astype(jnp.int32),
    )
    return rec


# ---------------------------------------------------------------------------
# Instanced spheres — the reference's BVH-of-anything composition covers
# sphere primitives too (bvh.jl:50-68; test_intersection.jl:129-156 nests a
# BVH of spheres inside a BVH). Here the base is a Spheres SoA stored ONCE;
# instances add only a transform table row each.
# ---------------------------------------------------------------------------

class InstancedSpheres:
    """Many transformed copies of one sphere array sharing the base table.

    Traversal reuses the generic demand-ordered instance sweep
    (:func:`_sweep_instances`); the inner closest-hit is the brute-force
    sphere quadratic over the base array in instance-local space (spheres
    carry their OWN object transform inside the base table, so clipping
    stays exact). The winner's detail record composes the two transforms
    per lane — instance ∘ sphere — and runs the standard sphere detail
    phase on the composed frame, so clipped spheres, Weingarten normal
    derivatives and uv all come out as if the instance had been flattened.
    """

    def __init__(self, base: "sph_mod.Spheres", table: InstanceTable):
        from ..shapes import sphere as sph_mod  # local to avoid cycle risk

        self._sph_mod = sph_mod
        self.base = base                       # host numpy leaves
        self.table = table
        self.n_base = sph_mod.num_spheres(base)
        self.n_instances = int(np.asarray(table.o2w).shape[0])

    def world_bounds_np(self) -> np.ndarray:
        lo = np.asarray(self.table.lo).min(axis=0)
        hi = np.asarray(self.table.hi).max(axis=0)
        return np.stack([lo, hi])[None]

    def traverse(self, o, d, t_max, any_hit: bool = False):
        sph_mod = self._sph_mod
        base = jax.tree.map(jnp.asarray, self.base)
        table = jax.tree.map(jnp.asarray, self.table)

        def inner(o_l, d_l, limit):
            h_all, t_all = sph_mod.intersect_all(base, o_l, d_l, limit)
            t_all = jnp.where(h_all, t_all, jnp.inf)
            idx = jnp.argmin(t_all, axis=-1).astype(jnp.int32)
            t = jnp.min(t_all, axis=-1)
            return jnp.isfinite(t), t, idx

        return _sweep_instances(table, self.n_instances, inner, o, d,
                                t_max, any_hit)

    def make_hit_record(self, o, d, time, elem_idx, inst_idx, valid,
                        prim_offset: int = 0):
        """Winner detail: gather base-sphere params at ``elem_idx``, compose
        per-lane transforms (o2w' = inst_o2w @ sph_o2w, w2o' = sph_w2o @
        inst_w2o — exact-f32 contraction, no MXU bf16), then reuse the flat
        sphere detail phase on the composed per-lane table."""
        import dataclasses

        sph_mod = self._sph_mod
        base = jax.tree.map(jnp.asarray, self.base)
        table = jax.tree.map(jnp.asarray, self.table)
        gs = lambda x: jnp.take(x, elem_idx, axis=0)
        gi = lambda x: jnp.take(x, inst_idx, axis=0)
        comp = lambda a, b: jnp.einsum(
            "nij,njk->nik", a, b, precision=jax.lax.Precision.HIGHEST
        )
        o2w = comp(gi(table.o2w), gs(base.o2w))        # [N, 4, 4]
        w2o = comp(gs(base.w2o), gi(table.w2o))
        lane_sph = dataclasses.replace(
            jax.tree.map(gs, base), o2w=o2w, w2o=w2o,
        )
        # Re-derive t for the composed frame: the sweep's t is world t and
        # the affine composition preserves it, so pass it straight through
        # (sphere.make_hit refines p back onto the sphere from o_obj +
        # t * d_obj, with d_obj unnormalized — exactly the sweep's setup).
        n = o.shape[0]
        t = self._winner_t(o, d, elem_idx, inst_idx)
        rec = sph_mod.make_hit(
            lane_sph, o, d, time, t, jnp.arange(n, dtype=jnp.int32), valid,
            prim_offset=0,
        )
        inst_mat = gi(table.material_id)
        rec = replace(
            rec,
            prim_id=(prim_offset + inst_idx * self.n_base
                     + elem_idx).astype(jnp.int32),
            material_id=jnp.where(
                inst_mat >= 0, inst_mat, rec.material_id
            ).astype(jnp.int32),
        )
        return rec

    def _winner_t(self, o, d, elem_idx, inst_idx):
        """Exact per-lane re-intersect of the winning (instance, sphere)
        pair — one lane-wise quadratic, matching the sweep's t."""
        sph_mod = self._sph_mod
        base = jax.tree.map(jnp.asarray, self.base)
        table = jax.tree.map(jnp.asarray, self.table)
        w2o_i = jnp.take(table.w2o, inst_idx, axis=0)          # [N, 4, 4]
        o_l = m.mat3_apply(w2o_i[..., :3, :3], o) + w2o_i[..., :3, 3]
        d_l = m.mat3_apply(w2o_i[..., :3, :3], d)
        lane_sph = jax.tree.map(lambda x: jnp.take(x, elem_idx, axis=0),
                                base)
        w2o_s = lane_sph.w2o
        o_obj = m.mat3_apply(w2o_s[..., :3, :3], o_l) + w2o_s[..., :3, 3]
        d_obj = m.mat3_apply(w2o_s[..., :3, :3], d_l)
        n = o.shape[0]
        _, t = sph_mod._candidate_t(
            lane_sph, o_obj, d_obj, jnp.full((n,), jnp.inf, F32)
        )
        return t


def build_sphere_instances(entries, transforms,
                           material_ids=None) -> InstancedSpheres:
    """Pack the base sphere array ONCE and derive the instance table from
    the transform list. ``entries``: list of sphere dicts (the
    SceneBuilder.sphere kwargs — object_to_world, radius, clipping,
    material_id)."""
    from ..shapes import sphere as sph_mod

    base = sph_mod.pack_spheres(entries)
    bounds = sph_mod.world_bounds_np(base)                 # [S, 2, 3]
    b_lo = bounds[:, 0].min(axis=0)
    b_hi = bounds[:, 1].max(axis=0)

    n_i = len(transforms)
    o2w = np.stack([np.asarray(t.m, np.float32) for t in transforms])
    w2o = np.stack([np.asarray(t.inv_m, np.float32) for t in transforms])
    lo = np.zeros((n_i, 3), np.float32)
    hi = np.zeros((n_i, 3), np.float32)
    for i in range(n_i):
        lo[i], hi[i] = _transform_aabb(o2w[i], b_lo, b_hi)
    swaps = np.array(
        [np.linalg.det(mm[:3, :3]) < 0 for mm in o2w], bool
    )
    if material_ids is None:
        mat = np.full(n_i, -1, np.int32)
    else:
        mat = np.asarray(material_ids, np.int32)
    table = InstanceTable(o2w, w2o, lo, hi, mat, swaps)
    return InstancedSpheres(base, table)
