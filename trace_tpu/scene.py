"""Scene: packed geometry + materials + lights, with batched intersection.

TPU-native counterpart of /root/reference/src/Trace.jl:176-211 (Scene,
intersect!/intersect_p, spawn_ray) plus the primitive layer
(primitive.jl). Instead of a BVH of heterogeneous Primitive objects, the
scene packs all spheres and all triangles into two SoA tables; intersection
is a batched closest-hit reduction over primitive chunks (the wavefront
"cheap phase"), with full SurfaceHit frames built only for each ray's
winning primitive. An accelerator culls the candidate set — the default
is the MXU cluster sweep (trace_tpu.accel.clusters, auto-attached for
>64 triangles); accel.mxu / accel.morton / ops.intersect_pallas provide
alternatives with the same interface.

Primitive ids are global: spheres occupy [0, S), triangles [S, S+T).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .core.interaction import SurfaceHit, empty_hit
from .core.ray import SPAWN_EPS
from .shapes import sphere as sph_mod
from .shapes import triangle as tri_mod
from .lights import lights as light_mod
from .materials.materials import Material

F32 = jnp.float32


class SceneBuilder:
    """Scene-as-code constructor graph mirroring the reference's user
    scripts (docs/code/spheres.jl:5-103): materials -> shapes -> lights."""

    def __init__(self):
        self._materials: list[Material] = []
        self._sphere_entries: list[dict] = []
        self._tri_parts: list[tri_mod.Triangles] = []
        self._tri_light: list[np.ndarray] = []
        self._tri_count = 0
        self._light_entries: list[dict] = []
        self._instanced: list = []

    def material(self, mat: Material) -> int:
        self._materials.append(mat)
        return len(self._materials) - 1

    def sphere(self, object_to_world, radius, material: int, **kw) -> None:
        self._sphere_entries.append(
            dict(object_to_world=object_to_world, radius=radius,
                 material_id=material, **kw)
        )

    def triangle_mesh(
        self, object_to_world, indices, vertices, material: int,
        normals=None, uv=None, reverse_orientation=False,
        emission=None, two_sided=False,
    ) -> None:
        """Add an indexed mesh. With ``emission`` set, the mesh becomes a
        diffuse area light (capability beyond the reference)."""
        part = tri_mod.pack_triangle_mesh(
            object_to_world, indices, vertices, normals=normals, uv=uv,
            material_id=material, reverse_orientation=reverse_orientation,
        )
        n = tri_mod.num_triangles(part)
        light_id = -1
        if emission is not None:
            light_id = len(self._light_entries)
            self._light_entries.append(
                light_mod.area_light(emission, self._tri_count, n, two_sided)
            )
        self._tri_parts.append(part)
        self._tri_light.append(np.full(n, light_id, np.int32))
        self._tri_count += n

    def instanced_mesh(
        self, indices, vertices, transforms, material: int,
        normals=None, uv=None, material_ids=None,
    ) -> None:
        """Many transformed copies of one mesh sharing a single base-mesh
        acceleration structure — the reference's nested-BVH capability
        (bvh.jl:50-68) in two-level wavefront form (accel/instances.py).
        Memory is O(mesh + len(transforms)); area-light emission is not
        supported on instanced geometry."""
        from .accel.instances import build_instances

        self._instanced.append(build_instances(
            indices, vertices, transforms, material_id=material,
            normals=normals, uv=uv, material_ids=material_ids,
        ))

    def instanced_spheres(self, entries, transforms,
                          material_ids=None) -> None:
        """Many transformed copies of one sphere array sharing a single
        base table — the reference composes BVHs over ANY primitive,
        spheres included (bvh.jl:50-68, test_intersection.jl:129-156);
        this is the sphere counterpart of instanced_mesh. ``entries``:
        list of sphere dicts (the .sphere kwargs). Memory is
        O(spheres + len(transforms))."""
        from .accel.instances import build_sphere_instances

        self._instanced.append(build_sphere_instances(
            entries, transforms, material_ids=material_ids,
        ))

    def light(self, entry: dict) -> None:
        self._light_entries.append(entry)

    def build(self, chunk_size: int = 2048, use_bvh: bool | None = None,
              max_prims_per_leaf: int = 4,
              exact_shared_edges: bool = False,
              accelerator: str = "auto") -> "Scene":
        """use_bvh None -> auto: attach a BVH when the triangle count makes
        the brute-force [rays x tris] grid unreasonable.

        ``accelerator``: "auto" picks "pallas_sweep" on a TPU backend and
        "clusters" elsewhere. "pallas_sweep" (ops/sweep_pallas.py —
        per-ray-block demand order with fused VMEM epilogue) is ~4x the
        XLA cluster sweep at 1M tris in round-5 EXECUTION-HONEST timing
        (415 vs 1604 ms per 16384 coherent rays; 199 vs 893 incoherent
        — the round-2 absolute figures like "1.99 ms frames" were
        enqueue-rate fiction, the RATIO held). Both paths test every
        triangle of every super any ray in a 512-ray block enters, so
        mesh-scale traversal is the framework's honest weak spot
        (ARCHITECTURE.md §7e). "clusters" is the portable path CPU
        tests run. "wbvh" is the batched per-ray BVH walk
        (accel/wbvh.py) — the per-ray-economy reference; measured
        slower than the sweep on TPU at mesh scale (§7f)."""
        spheres = sph_mod.pack_spheres(self._sphere_entries)
        tris = tri_mod.concat_triangles(self._tri_parts)
        tri_light = (
            np.concatenate(self._tri_light)
            if self._tri_light else np.zeros(0, np.int32)
        )
        lights = light_mod.pack_lights(self._light_entries, tris)
        scene = Scene(spheres, tris, self._materials, lights, tri_light,
                      chunk_size=chunk_size, instanced=self._instanced,
                      exact_edges=exact_shared_edges)
        if use_bvh is None:
            use_bvh = scene.n_triangles > 64
        if use_bvh and scene.n_triangles:
            if accelerator == "auto":
                accelerator = (
                    "pallas_sweep" if jax.default_backend() == "tpu"
                    else "clusters"
                )
            if accelerator == "wbvh":
                from .accel.wbvh import attach as attach_wbvh

                attach_wbvh(scene, max_prims_per_leaf=max_prims_per_leaf)
            elif accelerator == "pallas_sweep":
                from .ops.sweep_pallas import attach as attach_sweep

                # The kernel's measured tuning: leaf 64 keeps each
                # (group x leaf) Moller-Trumbore panel MXU-tile aligned;
                # its per-block demand order already provides the tight
                # culling the cluster path buys with finer leaves.
                attach_sweep(scene, leaf_tris=64,
                             max_prims_per_leaf=max_prims_per_leaf,
                             ray_chunk=16384)
            else:
                from .accel.clusters import attach

                # Leaf/stage from a v5e sweep (1M-tri heightfield, camera
                # rays): small leaves + wide stages retire lanes earlier
                # — 64/128 measured 107 Mrays/s vs 72 for 128/64; small
                # scenes keep finer leaves for tighter culling.
                if scene.n_triangles < 300_000:
                    leaf, stage = 32, 64
                else:
                    leaf, stage = 64, 128
                attach(scene, leaf_tris=leaf, stage_clusters=stage,
                       max_prims_per_leaf=max_prims_per_leaf)
        return scene


def _chunked_closest(intersect_fn, total, o, d, t_max, chunk):
    """Running closest-hit reduction over primitive chunks.

    intersect_fn(start, size) -> (hit [N, size], t [N, size]); indices are
    chunk-local. Returns (hit [N], t [N], idx [N] global).
    """
    n = o.shape[0]
    best_t = jnp.full((n,), jnp.inf, F32)
    best_i = jnp.zeros((n,), jnp.int32)
    for start in range(0, total, chunk):
        size = min(chunk, total - start)
        hit, t = intersect_fn(start, size)
        t = jnp.where(hit & (t <= t_max[:, None]), t, jnp.inf)
        li = jnp.argmin(t, axis=-1).astype(jnp.int32)
        lt = jnp.min(t, axis=-1)  # == t[li], no gather
        better = lt < best_t
        best_t = jnp.where(better, lt, best_t)
        best_i = jnp.where(better, li + start, best_i)
    return jnp.isfinite(best_t), best_t, best_i


class Scene:
    def __init__(self, spheres, triangles, materials, lights, tri_light_id,
                 chunk_size: int = 2048, instanced=None,
                 exact_edges: bool = False):
        # Geometry/light tables are HOST (numpy) pytrees by design: jitted
        # render passes close over them and XLA embeds them from host
        # memory for free. A device-array leaf would be read back (d2h)
        # at trace time, which permanently degrades the TPU relay's
        # dispatch latency (~20us -> ~2.7ms measured on v5e) — so nothing
        # here may hold device arrays.
        self.spheres = spheres
        self.triangles = triangles
        self.spheres_host = jax.tree.map(np.asarray, spheres)
        self.triangles_host = jax.tree.map(np.asarray, triangles)
        self.materials = list(materials)
        self.tri_light_id = np.asarray(tri_light_id, np.int32)
        self.chunk_size = int(chunk_size)
        self.n_spheres = sph_mod.num_spheres(spheres)
        self.n_triangles = tri_mod.num_triangles(triangles)
        # Reference f64 edge-function fallback (double-single form,
        # shapes/triangle.py) on the brute-force + winner-detail paths.
        self.exact_edges = bool(exact_edges)
        self.instanced = list(instanced or [])
        self.accel = None  # optional accelerator (accel/*.attach)

        # Global prim-id ranges: spheres [0, S), triangles [S, S+T), then
        # each instanced geometry gets I * n_base ids.
        off = self.n_spheres + self.n_triangles
        self._instanced_offsets = []
        for geom in self.instanced:
            self._instanced_offsets.append(off)
            off += geom.n_instances * geom.n_base

        # World bound + bounding sphere; preprocess lights with it
        # (the reference forgets: Trace.jl:184 TODO).
        bounds = []
        if self.n_spheres:
            bounds.append(sph_mod.world_bounds_np(spheres))
        if self.n_triangles:
            bounds.append(tri_mod.world_bounds_np(triangles))
        for geom in self.instanced:
            bounds.append(geom.world_bounds_np())
        if bounds:
            allb = np.concatenate(bounds, axis=0)
            lo, hi = allb[:, 0].min(0), allb[:, 1].max(0)
        else:
            lo = hi = np.zeros(3, np.float32)
        self.world_lo, self.world_hi = lo, hi
        center = (lo + hi) / 2
        radius = float(np.linalg.norm(hi - center))
        self.lights = light_mod.preprocess(lights, center, radius)
        # Host snapshot of the light table STRUCTURE (kinds, flags,
        # triangle ranges): with_lights views swap self.lights for a
        # TRACED table (relight executable reuse), but the structure is
        # per-scene static — the planar wavefront path dispatches on it
        # (wavefront/lights.py) while reading numeric params from the
        # live table.
        self.lights_host = self.lights
        self.max_area_tris = int(
            np.asarray(self.lights.tri_count).max(initial=0)
        )
        # Jitted render passes take the scene as a STATIC argument and
        # bake its tables in at trace time. Mutating scene contents
        # (set_frame_lights, accel swaps) must therefore change the hash,
        # or a cached executable would silently keep the old tables.
        self._version = 0

    def bump_version(self) -> None:
        """Call after mutating scene contents (lights, accel, geometry)
        so jit caches keyed on the scene re-trace."""
        self._version += 1

    def with_lights(self, lights) -> "Scene":
        """Shallow view of this scene with the light table swapped.

        Used inside jitted passes to thread the lights in as a TRACED
        argument (integrators upload them once per render): a frame
        relight then reuses the compiled executable instead of
        re-tracing every graph — the per-frame economics of the animated
        scenes (caustic_moving.jl) depend on this."""
        import copy

        view = copy.copy(self)
        view.lights = lights
        return view

    def with_geometry(self, triangles, accelerator) -> "Scene":
        """Shallow view with the triangle table and accelerator swapped.

        The geometry analog of with_lights: integrators thread a TRACED
        Triangles pytree (moved vertices/normals, fixed topology) plus an
        accelerator over a device-built ClusterAccel into the jitted
        passes, so animated geometry reuses compiled executables — a
        per-frame device Morton rebuild (accel/morton.py) instead of a
        host refit + re-trace. World bounds and light preprocessing stay
        those of the base scene (motion is assumed to stay within the
        original bounding volume's neighborhood)."""
        import copy

        view = copy.copy(self)
        view.triangles = triangles
        view.accel = accelerator
        return view

    def __hash__(self):
        return hash((id(self), self._version))

    def __eq__(self, other):
        return self is other and getattr(other, "_version", None) == self._version

    # -- intersection -------------------------------------------------------

    def _closest_candidates(self, o, d, t_max):
        """(sphere: hit,t,idx) and (triangle: hit,t,idx) closest hits."""
        n = o.shape[0]
        no_hit = (jnp.zeros(n, bool), jnp.full(n, jnp.inf, F32),
                  jnp.zeros(n, jnp.int32))
        if self.accel is not None:
            return self.accel.closest(self, o, d, t_max)

        if self.n_spheres:
            hs = _chunked_closest(
                lambda s, c: sph_mod.intersect_all(
                    jax.tree.map(lambda x: x[s:s + c], self.spheres), o, d, t_max
                ),
                self.n_spheres, o, d, t_max, self.chunk_size,
            )
        else:
            hs = no_hit
        if self.n_triangles:
            ht = _chunked_closest(
                lambda s, c: tri_mod.intersect_all(
                    jax.tree.map(lambda x: x[s:s + c], self.triangles),
                    o, d, t_max, exact_edges=self.exact_edges,
                ),
                self.n_triangles, o, d, t_max, self.chunk_size,
            )
        else:
            ht = no_hit
        return hs, ht

    def intersect(self, o, d, t_max, time=None) -> SurfaceHit:
        """Closest-hit over the whole scene -> SurfaceHit batch
        (Trace.jl:189-193 + primitive.jl:12-20). Candidate sources
        (spheres, flat triangles, each instanced geometry) are reduced to
        one winner per lane; detail records are built per source and
        where-merged (ties break toward the earlier source, keeping the
        historical sphere-over-triangle tie rule)."""
        n = o.shape[0]
        if time is None:
            time = jnp.zeros(n, F32)
        (hit_s, t_s, i_s), (hit_t, t_t, i_t) = self._closest_candidates(
            o, d, t_max
        )

        # (hit, t, make_record(valid_mask)) per candidate source.
        sources = []
        if self.n_spheres:
            sources.append((hit_s, t_s, lambda v, t_s=t_s, i_s=i_s:
                            sph_mod.make_hit(self.spheres, o, d, time,
                                             t_s, i_s, v)))
        if self.n_triangles:
            # Certified accel path: the cheap phase already guarantees the
            # winner (widened epilogue); the watertight recompute must not
            # re-drop exactly-on-edge hits (triangle.make_hit trust_valid).
            trust = self.exact_edges and self.accel is not None
            sources.append((hit_t, t_t, lambda v, i_t=i_t, trust=trust:
                            tri_mod.make_hit(self.triangles, o, d, time,
                                             i_t, v,
                                             prim_offset=self.n_spheres,
                                             exact_edges=self.exact_edges,
                                             trust_valid=trust)))
        if self.instanced:
            for geom, offset in zip(self.instanced,
                                    self._instanced_offsets):
                h_g, t_g, tri_g, inst_g = geom.traverse(o, d, t_max)
                sources.append((
                    h_g, t_g,
                    lambda v, geom=geom, tri_g=tri_g, inst_g=inst_g,
                           offset=offset:
                    geom.make_hit_record(o, d, time, tri_g, inst_g, v,
                                         prim_offset=offset),
                ))

        if not sources:
            return empty_hit((n,))
        ts = jnp.stack(
            [jnp.where(h, t, jnp.inf) for h, t, _ in sources], axis=0
        )
        win = jnp.argmin(ts, axis=0)  # first minimum -> earlier source
        rec = None
        for k, (h_k, _, make_k) in enumerate(sources):
            valid_k = h_k & (win == k)
            rec_k = make_k(valid_k)
            if rec is None:
                rec = rec_k
            else:
                sel = valid_k
                rec = jax.tree.map(
                    lambda a, b: jnp.where(
                        sel.reshape(sel.shape + (1,) * (a.ndim - sel.ndim)),
                        a, b,
                    ),
                    rec_k, rec,
                )
        return rec

    def intersect_p(self, o, d, t_max):
        """Any-hit occlusion over the whole scene (Trace.jl:194)."""
        n = o.shape[0]
        occ = jnp.zeros(n, bool)
        if self.instanced:
            for geom in self.instanced:
                h_g, t_g, _, _ = geom.traverse(o, d, t_max, any_hit=True)
                occ = occ | (h_g & (t_g <= t_max))
        if self.accel is not None:
            return occ | self.accel.any_hit(self, o, d, t_max)
        if self.n_spheres:
            for start in range(0, self.n_spheres, self.chunk_size):
                c = min(self.chunk_size, self.n_spheres - start)
                part = jax.tree.map(lambda x: x[start:start + c], self.spheres)
                h, t = sph_mod.intersect_all(part, o, d, t_max)
                occ = occ | jnp.any(h & (t <= t_max[:, None]), axis=-1)
        if self.n_triangles:
            for start in range(0, self.n_triangles, self.chunk_size):
                c = min(self.chunk_size, self.n_triangles - start)
                part = jax.tree.map(lambda x: x[start:start + c], self.triangles)
                h, t = tri_mod.intersect_all(part, o, d, t_max,
                                             exact_edges=self.exact_edges)
                occ = occ | jnp.any(h & (t <= t_max[:, None]), axis=-1)
        return occ

    # -- lights -------------------------------------------------------------

    def unoccluded(self, p0, p1, time=None, n_geom=None):
        """Shadow-ray test between two points (light.jl:17-19): ray along
        the unnormalized p1-p0 with t_max 1 - eps, origin epsilon-offset
        (Trace.jl:196-203). Deviation: the reference leaves t_max = inf, so
        its shadow rays can be occluded by geometry *beyond* the light; we
        clip at the light (PBRT semantics).

        With ``n_geom`` (the surface's geometric normal, [N, 3]) the
        origin is additionally nudged along the normal, PBRT-style — the
        reference's direction-only 1e-6 offset leaves ~0.4% of on-sphere
        points falsely self-occluded at f32 (deterministic per point, so
        it shows as stray black pixels at any spp)."""
        d = p1 - p0
        o = p0 + SPAWN_EPS * d
        if n_geom is not None:
            scale = 1e-4 * jnp.maximum(
                1.0, jnp.max(jnp.abs(p0), axis=-1, keepdims=True)
            )
            side = jnp.sign(jnp.sum(n_geom * d, axis=-1, keepdims=True))
            o = o + n_geom * (scale * side)
        n = p0.shape[0]
        t_max = jnp.full((n,), 1.0 - 1e-4, F32)
        return ~self.intersect_p(o, d, t_max)

    def transmittance(self, p0, p1, time=None):
        """Beam transmittance between two points — the reference
        VisibilityTester's ``trace`` (light.jl:21-35): it walks successive
        hits, returning black on any hit with a material and skipping
        material-less hits. Every primitive in this framework carries a
        material (primitive packing requires a material id), so the walk
        collapses exactly to the occlusion predicate: 1 where unoccluded,
        0 otherwise. Kept as API parity for integrators that expect a
        spectral transmittance."""
        vis = self.unoccluded(p0, p1, time)
        return jnp.where(vis[..., None], 1.0, 0.0) * jnp.ones((1, 3), F32)

    def area_light_radiance(self, hit, wo):
        """Emitted radiance at hit points on emissive triangles — the `le`
        that is identically black in the reference
        (surface_interaction.jl:149-152)."""
        n = hit.t.shape[0]
        if self.max_area_tris == 0 or self.n_triangles == 0:
            return jnp.zeros((n, 3), F32)
        tri_idx = jnp.clip(hit.prim_id - self.n_spheres, 0, self.n_triangles - 1)
        # Instanced prim ids sit above the flat-triangle range and never
        # carry area-light emission.
        is_flat_tri = (hit.prim_id >= self.n_spheres) & (
            hit.prim_id < self.n_spheres + self.n_triangles
        )
        lid = jnp.where(
            hit.valid & is_flat_tri,
            jnp.asarray(self.tri_light_id)[tri_idx],
            -1,
        )
        le = light_mod.le_area(self.lights, jnp.maximum(lid, 0), hit.n, wo)
        return jnp.where((lid >= 0)[:, None], le, 0.0)
