"""Stochastic Progressive Photon Mapping as deterministic wavefront passes.

TPU-native counterpart of /root/reference/src/integrators/sppm.jl — the
reference's flagship integrator. The five phases per iteration
(sppm.jl:152-173) map to jitted megabatch passes:

1. Camera pass (sppm.jl:175-270): one vectorized bounce walk per pixel;
   visible points land in a SoA ``VisiblePoints`` pytree (β, p, wo and a
   compact 2-slot lobe table instead of a stored BSDF object).
2. Grid build (sppm.jl:278-318): the mutex-free replacement for the
   linked-list hash grid — each visible point emits its <=8 overlapped
   cells (cell edge = 2·max_radius), entries are sorted by hashed cell id,
   and photons look ranges up with binary search. Hash collisions are
   filtered by the same distance test as the reference, so the hash/
   resolution choice affects performance only, not the image.
3. Photon pass (sppm.jl:320-436): Halton-sequenced emission keyed on the
   global photon index (deterministic under any sharding), bounce walk with
   the reference's exact Russian roulette (including its quirk of never
   updating β along the path — the update is commented out, sppm.jl:430).
4. Photon -> visible-point accumulation: instead of atomics
   (sppm.jl:394-399), (photon, visible-point) candidate pairs are expanded
   by exclusive scan over per-photon cell-entry counts and reduced with
   deterministic scatter-adds over fixed-size pair chunks.
5. Pixel update + progressive image (sppm.jl:438-472), a pure pytree map.

Deviation kept deliberately: like the reference (sppm.jl:229), the direct-
lighting estimate added to Ld is NOT scaled by the path throughput β.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..bxdf import bsdf as B
from ..bxdf import lobes as lb
from ..core import math as m
from ..core import spectrum as spec
from ..core.ray import SPAWN_EPS, scale_differentials
from ..lights import lights as light_mod
from ..materials.materials import compute_scattering
from ..sampler.halton import radical_inverse
from ..sampler import uniform as U
from ..utils.pytree import pytree, replace
from . import common

F32 = jnp.float32
VP_LOBES = 2  # compact visible-point lobe slots (all shipped materials
              # place their non-specular lobes in slots 0..1)


@pytree
class SPPMState:
    ld: jnp.ndarray       # [P, 3] accumulated direct lighting
    tau: jnp.ndarray      # [P, 3]
    radius: jnp.ndarray   # [P]
    n: jnp.ndarray        # [P] photon count estimate
    phi: jnp.ndarray      # [P, 3] this-iteration photon sum
    m: jnp.ndarray        # [P] int32 this-iteration photon count


@pytree
class VisiblePoints:
    p: jnp.ndarray        # [P, 3]
    wo: jnp.ndarray       # [P, 3]
    beta: jnp.ndarray     # [P, 3]
    valid: jnp.ndarray    # [P] bool
    lobes: B.Lobes        # [P, VP_LOBES] slots + frame


def initial_state(n_pixels: int, initial_radius: float) -> SPPMState:
    # Distinct buffers: phi is donated to the pair pass, so it must not
    # alias ld/tau.
    z3 = lambda: jnp.zeros((n_pixels, 3), F32).block_until_ready()
    return SPPMState(
        ld=z3(), tau=z3(),
        radius=jnp.full((n_pixels,), initial_radius, F32),
        n=jnp.zeros((n_pixels,), F32),
        phi=z3(), m=jnp.zeros((n_pixels,), jnp.int32),
    )


def _compact_lobes(lobes: B.Lobes) -> B.Lobes:
    """Keep the first VP_LOBES slots (materials.py places diffuse/glossy
    lobes there; delta lobes evaluate to 0 in the photon phase anyway)."""
    import dataclasses

    slot_fields = ("kind", "c0", "c1", "eta_a", "eta_b", "a", "b",
                   "fr_kind", "fr_eta", "fr_k")
    upd = {f: getattr(lobes, f)[:, :VP_LOBES] for f in slot_fields}
    return dataclasses.replace(lobes, **upd)


def _gather_lobes(lobes: B.Lobes, idx) -> B.Lobes:
    return jax.tree.map(lambda x: x[idx], lobes)


def _where_lobes(mask, a: B.Lobes, b: B.Lobes) -> B.Lobes:
    return jax.tree.map(
        lambda x, y: jnp.where(
            mask.reshape(mask.shape + (1,) * (x.ndim - 1)), x, y
        ),
        a, b,
    )


def _hash_cells(gx, gy, gz, n_pixels):
    """3-prime XOR hash (sppm.jl:497-501), uint32 arithmetic."""
    h = (
        (gx.astype(jnp.uint32) * jnp.uint32(73856093))
        ^ (gy.astype(jnp.uint32) * jnp.uint32(19349663))
        ^ (gz.astype(jnp.uint32) * jnp.uint32(83492791))
    )
    return (h % jnp.uint32(n_pixels)).astype(jnp.int32)


def _to_grid(p, lo, res, inv_extent):
    """Grid coords + in-bounds flag (sppm.jl:479-495)."""
    off = (p - lo) * inv_extent
    g = jnp.floor(res.astype(F32) * off).astype(jnp.int32)
    in_bounds = jnp.all((g >= 0) & (g < res), axis=-1)
    return in_bounds, jnp.clip(g, 0, res - 1)


class SPPMIntegrator:
    """Drop-in equivalent of the reference SPPMIntegrator functor
    (sppm.jl:108-173)."""

    def __init__(self, camera, initial_search_radius: float = 1.0,
                 max_depth: int = 5, n_iterations: int = 64,
                 photons_per_iteration: int = -1, write_frequency: int = 0,
                 pixel_chunk: int = 1 << 16, pair_chunk: int = 1 << 19,
                 seed: int = 0, stats=None, mesh=None,
                 shard_axis: str = "photons", shard_camera: bool = False,
                 fused_iterations: bool = False, fused_block: int = 8,
                 fused_unroll: bool = False):
        self.stats = stats
        self.mesh = mesh            # jax.sharding.Mesh -> SPMD photon/pair
        self.shard_axis = shard_axis
        # Camera-pass sharding is bit-exact: camera streams are
        # pixel-identity-keyed (sampler.uniform.lane_keys), photon/pair
        # sharding is Halton-keyed. Opt-in for dispatch-count reasons.
        self.shard_camera = bool(shard_camera)
        self.camera = camera
        self.initial_search_radius = float(initial_search_radius)
        self.max_depth = int(max_depth)
        self.n_iterations = int(n_iterations)
        film = camera.film
        self.n_pixels = film.width * film.height
        self.photons_per_iteration = (
            int(photons_per_iteration) if photons_per_iteration > 0
            else self.n_pixels
        )
        self.write_frequency = int(write_frequency)
        self.pixel_chunk = int(pixel_chunk)
        self.pair_chunk = int(pair_chunk)
        self.seed = int(seed)
        # Whole iteration blocks as one dispatch (_iterations_fused):
        # verified bit-exact vs stepwise on CPU (tested). Long unbounded
        # blocks fault the TPU runtime through the relay (round-1
        # isolation: 3-iteration blocks ran, 100-iteration blocks died),
        # so render() caps each dispatch at ``fused_block`` iterations.
        # Round-2 on-chip bisect at FLAGSHIP scale (1024^2, 262k
        # photons/iter, depth 8): even TWO iteration bodies in one
        # program fault, whether expressed as a fori_loop or unrolled
        # straight-line XLA — the trigger is program size, not the loop
        # construct. fused_block=1 (one whole iteration per dispatch) is
        # stable at any scale and, because render() never syncs between
        # blocks, the ~100 dispatches pipeline asynchronously through
        # the relay — measured ~6x faster per iteration than the
        # stepwise path (~10 dispatches/iteration). Use fused_block=1
        # for large frames; bigger blocks only help small frames where
        # the program fits.
        self.fused_iterations = bool(fused_iterations)
        self.fused_block = max(1, int(fused_block))
        # Unroll the iteration block into straight-line XLA instead of a
        # device fori_loop (compile time grows ~linearly with
        # fused_block). Diagnostic knob from the flagship-scale fault
        # isolation above; equivalence-tested vs the loop form.
        self.fused_unroll = bool(fused_unroll)

    # ------------------------------------------------------------------
    # Phase 1: camera pass
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def _camera_pass_all(self, scene, pixels, lane_valid, it_key, lights,
                         geom=None):
        """Every camera chunk in ONE dispatch: lax.fori_loop over
        fixed-size chunks with the identical per-chunk key schedule as
        the python loop (bit-identical results). Each dispatch through
        the TPU tunnel costs ~0.4 ms; at 1024^2 the chunked python loop
        paid that 16x per iteration. ``geom`` (optional) is a traced
        (Triangles, ClusterAccel) pair — see common.apply_geometry."""
        scene = common.apply_geometry(scene.with_lights(lights), geom)
        n_pad = pixels.shape[0]
        chunk = min(self.pixel_chunk, n_pad)
        n_chunks = n_pad // chunk  # caller pads to a multiple

        ld_all = jnp.zeros((n_pad, 3), F32)
        vp_all = VisiblePoints(
            p=jnp.zeros((n_pad, 3), F32), wo=jnp.zeros((n_pad, 3), F32),
            beta=jnp.zeros((n_pad, 3), F32),
            valid=jnp.zeros((n_pad,), bool),
            lobes=_compact_lobes(B.empty_lobes(n_pad)),
        )

        def body(ci, carry):
            ld_all, vp_all = carry
            start = ci * chunk
            part = jax.lax.dynamic_slice(pixels, (start, 0), (chunk, 2))
            val = jax.lax.dynamic_slice(lane_valid, (start,), (chunk,))
            # it_key unfolded: per-lane streams are pixel-identity-keyed
            # inside _camera_pass_body, so pixel_chunk (and sharding) are
            # purely perf knobs.
            ld_c, vp_c = self._camera_pass_body(scene, part, val, it_key)
            ld_all = jax.lax.dynamic_update_slice(ld_all, ld_c, (start, 0))
            vp_all = jax.tree.map(
                lambda a, c_: jax.lax.dynamic_update_slice(
                    a, c_, (start,) + (0,) * (c_.ndim - 1)
                ),
                vp_all, vp_c,
            )
            return ld_all, vp_all

        return jax.lax.fori_loop(0, n_chunks, body, (ld_all, vp_all))

    def _camera_pass_body(self, scene, pixels, lane_valid, key):
        """Vectorized visible-point generation (sppm.jl:175-270) for a
        chunk of pixels. Returns (ld_add [C,3], VisiblePoints chunk).
        Pure (unjitted) so it can also run under shard_map.

        Dispatches to the planar wavefront twin
        (wavefront/sppm_camera.py — the round-5 layout fast path) for
        supported scenes; this packed body stays the oracle and the
        fallback (env lights, instanced geometry, animated views)."""
        if getattr(self, "li_impl", "auto") != "packed":
            from ..wavefront import sppm_camera as planar

            if planar.supports(scene):
                return planar.camera_pass_body(
                    self, scene, pixels, lane_valid, key)
        return self._camera_pass_body_packed(scene, pixels, lane_valid,
                                             key)

    def _camera_pass_body_packed(self, scene, pixels, lane_valid, key):
        c = pixels.shape[0]
        inv_sqrt_spp = np.float32(1.0 / np.sqrt(self.n_iterations))
        ks = U.lane_keys(key, U.pixel_ids(pixels))
        p_film, u_lens, u_time = U.get_camera_samples_lanes(
            U.fold_lanes(ks, 0), pixels
        )
        rd, beta_w = self.camera.generate_ray_differentials(
            p_film, u_lens, u_time
        )
        rd = scale_differentials(rd, inv_sqrt_spp)

        o, d = rd.o, rd.d
        time = rd.time
        beta = jnp.ones((c, 3), F32) * beta_w[:, None]
        active = lane_valid & (beta_w > 0)
        specular_bounce = jnp.zeros((c,), bool)
        ld = jnp.zeros((c, 3), F32)
        vp = VisiblePoints(
            p=jnp.zeros((c, 3), F32), wo=jnp.zeros((c, 3), F32),
            beta=jnp.zeros((c, 3), F32), valid=jnp.zeros((c,), bool),
            lobes=_compact_lobes(B.empty_lobes(c)),
        )

        def body(depth, carry):
            # depth is traced (1-based); one compiled body serves every
            # level — the dominant compile-time lever on a single host core.
            o, d, time, beta, active, specular_bounce, ld, vp = carry
            k_depth = U.fold_lanes(ks, depth)
            hit = scene.intersect(o, d, jnp.full((c,), jnp.inf, F32), time)
            live = active & hit.valid
            hit = replace(hit, valid=live)
            lobes = compute_scattering(
                scene.materials, hit, allow_multiple_lobes=True,
                mode=lb.RADIANCE,
            )
            # Emitted radiance at depth 1 / after a specular bounce
            # (sppm.jl:226-228; identically 0 in the reference, area lights
            # for us).
            le = scene.area_light_radiance(hit, hit.wo)
            emit_mask = live & (specular_bounce | (depth == 1))
            ld = ld + jnp.where(emit_mask[:, None], beta * le, 0.0)
            # Escaped rays at camera/specular vertices see the environment
            # light (sppm.jl:210-213's miss branch, identically 0 there).
            if light_mod.has_env(scene.lights):
                esc = active & ~hit.valid & (specular_bounce | (depth == 1))
                bg = light_mod.env_le(scene.lights, d)
                ld = ld + jnp.where(esc[:, None], beta * bg, 0.0)
            # Direct lighting — intentionally NOT scaled by β, matching the
            # reference (sppm.jl:229-231).
            direct = common.uniform_sample_one_light(
                scene, hit, lobes, U.fold_lanes(k_depth, 0)
            )
            ld = ld + jnp.where(live[:, None], direct, 0.0)

            # Visible-point creation (sppm.jl:233-245).
            is_diffuse = B.num_components(
                lobes,
                lb.BSDF_DIFFUSE | lb.BSDF_REFLECTION | lb.BSDF_TRANSMISSION,
            ) > 0
            is_glossy = B.num_components(
                lobes,
                lb.BSDF_GLOSSY | lb.BSDF_REFLECTION | lb.BSDF_TRANSMISSION,
            ) > 0
            make_vp = live & (
                is_diffuse | (is_glossy & (depth == self.max_depth))
            )
            vp = VisiblePoints(
                p=jnp.where(make_vp[:, None], hit.p, vp.p),
                wo=jnp.where(make_vp[:, None], hit.wo, vp.wo),
                beta=jnp.where(make_vp[:, None], beta, vp.beta),
                valid=vp.valid | make_vp,
                lobes=_where_lobes(make_vp, _compact_lobes(lobes), vp.lobes),
            )
            active = live & ~make_vp

            # Continue the path (sppm.jl:248-268).
            u = U.uniform_lanes(U.fold_lanes(k_depth, 1), 2)
            bs = B.sample_f(lobes, hit.wo, u, lb.BSDF_ALL)
            ok = active & (bs.pdf > 0) & ~spec.is_black(bs.f)
            specular_bounce = jnp.where(
                ok, (bs.sampled_flags & lb.BSDF_SPECULAR) != 0, specular_bounce
            )
            beta_new = beta * bs.f * (
                jnp.abs(m.dot(bs.wi, hit.ns)) / jnp.maximum(bs.pdf, 1e-20)
            )[:, None]
            by = spec.to_y(beta_new)
            rr = by < 0.25
            cp = jnp.minimum(1.0, by)
            u_rr = U.uniform_lanes(U.fold_lanes(k_depth, 2), 1)[:, 0]
            killed = rr & (u_rr > cp)
            beta_next = jnp.where(
                (rr & ~killed)[:, None],
                beta_new / jnp.maximum(cp, 1e-20)[:, None],
                beta_new,
            )
            # Keep β/ray unchanged on lanes that stopped (they're dead).
            beta = jnp.where(ok[:, None], beta_next, beta)
            active = ok & ~killed
            o = jnp.where(active[:, None], hit.p + SPAWN_EPS * bs.wi, o)
            d = jnp.where(active[:, None], bs.wi, d)
            time = jnp.where(active, hit.time, time)
            return (o, d, time, beta, active, specular_bounce, ld, vp)

        # The whole carry goes through vary_like: several components
        # (camera weight, shutter time, RNG draws) are shard-replicated
        # constants that must still carry the varying axis under shard_map.
        carry = common.vary_like(
            (o, d, time, beta, active, specular_bounce, ld, vp),
            rd.o[..., 0],
        )
        carry = jax.lax.fori_loop(1, self.max_depth + 1, body, carry)
        _, _, _, _, _, _, ld, vp = carry
        return ld, vp

    # ------------------------------------------------------------------
    # Phase 2: grid build
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0,))
    def _build_grid(self, vp: VisiblePoints, radius):
        """Sorted cell-entry table over visible points (sppm.jl:278-318).

        Cell edge = 2 * max_radius so a visible point's radius box overlaps
        at most 2 cells per axis -> 8 entries per point.
        """
        p_total = vp.p.shape[0]
        valid = vp.valid & ~spec.is_black(vp.beta)
        big = jnp.float32(3e38)
        r = jnp.where(valid, radius, 0.0)
        lo = jnp.min(
            jnp.where(valid[:, None], vp.p - r[:, None], big), axis=0
        )
        hi = jnp.max(
            jnp.where(valid[:, None], vp.p + r[:, None], -big), axis=0
        )
        max_r = jnp.maximum(jnp.max(r), 1e-12)
        diag = jnp.maximum(hi - lo, 1e-12)
        max_diag = jnp.max(diag)
        base_res = jnp.maximum(
            jnp.floor(max_diag / (2.0 * max_r)), 1.0
        )
        res = jnp.maximum(
            jnp.floor(base_res * diag / max_diag), 1.0
        ).astype(jnp.int32)
        inv_extent = 1.0 / diag

        _, gmin = _to_grid(vp.p - r[:, None], lo, res, inv_extent)
        _, gmax = _to_grid(vp.p + r[:, None], lo, res, inv_extent)

        cells = []
        masks = []
        seen = []
        for cz in (0, 1):
            for cy in (0, 1):
                for cx in (0, 1):
                    gx = jnp.where(cx == 0, gmin[:, 0], gmax[:, 0])
                    gy = jnp.where(cy == 0, gmin[:, 1], gmax[:, 1])
                    gz = jnp.where(cz == 0, gmin[:, 2], gmax[:, 2])
                    key3 = (gx, gy, gz)
                    dup = jnp.zeros(p_total, bool)
                    for s in seen:
                        dup = dup | (
                            (s[0] == gx) & (s[1] == gy) & (s[2] == gz)
                        )
                    seen.append(key3)
                    cells.append(_hash_cells(gx, gy, gz, self.n_pixels))
                    masks.append(valid & ~dup)
        cell_ids = jnp.stack(cells, 1).reshape(-1)          # [8P]
        entry_ok = jnp.stack(masks, 1).reshape(-1)
        vp_ids = jnp.repeat(jnp.arange(p_total, dtype=jnp.int32), 8)
        sort_key = jnp.where(entry_ok, cell_ids, self.n_pixels)
        order = jnp.argsort(sort_key, stable=True)
        return dict(
            sorted_cells=sort_key[order],
            sorted_vp=vp_ids[order],
            lo=lo, res=res, inv_extent=inv_extent,
        )

    # ------------------------------------------------------------------
    # Phase 3: photon walk
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def _photon_walk_all(self, scene, halton_base, light_cdf, light_pmf,
                         grid_lo, grid_res, grid_inv_extent, sorted_cells,
                         lights, geom=None):
        """Every photon chunk in ONE dispatch (see _camera_pass_all).
        Chunk layout and Halton indexing match the python loop exactly,
        so splat ordering (and therefore the whole iteration) is
        bit-identical."""
        scene = common.apply_geometry(scene.with_lights(lights), geom)
        np_iter = self.photons_per_iteration
        chunk = min(self.pixel_chunk, np_iter)
        n_chunks = -(-np_iter // chunk)
        seg = (self.max_depth - 1) * chunk  # splat rows per chunk

        def one_chunk(ci):
            lane = jnp.arange(chunk, dtype=jnp.uint32)
            gidx = jnp.uint32(ci) * jnp.uint32(chunk) + lane
            idx = halton_base + gidx
            valid = gidx < jnp.uint32(np_iter)
            return self._photon_walk_body(
                scene, idx, valid, light_cdf, light_pmf,
                grid_lo, grid_res, grid_inv_extent, sorted_cells,
            )

        first = jax.tree.map(
            lambda x: jnp.zeros((n_chunks * x.shape[0],) + x.shape[1:],
                                x.dtype),
            jax.eval_shape(one_chunk, 0),
        )

        def body(ci, acc):
            sp = one_chunk(ci)
            return {
                k: jax.lax.dynamic_update_slice(
                    acc[k], v, (ci * seg,) + (0,) * (v.ndim - 1)
                )
                for k, v in sp.items()
            }

        return jax.lax.fori_loop(0, n_chunks, body, first)

    def _photon_walk_body(self, scene, halton_idx, lane_valid,
                          light_cdf, light_pmf,
                          grid_lo, grid_res, grid_inv_extent, sorted_cells):
        """Emit + walk a chunk of photons (sppm.jl:334-436). Returns splat
        records for depths 2..max_depth: dict of [S=(D-1)*C] arrays with
        the cell-range (start, count) of each splat. Pure (unjitted) so it
        can also run under shard_map (parallel/sppm.py).

        Dispatches to the planar wavefront twin
        (wavefront/sppm_photon.py) for supported scenes; this packed
        body stays the oracle and the fallback."""
        if getattr(self, "li_impl", "auto") != "packed":
            from ..wavefront import sppm_photon as planar

            if planar.supports(scene):
                return planar.photon_walk_body(
                    self, scene, halton_idx, lane_valid, light_cdf,
                    light_pmf, grid_lo, grid_res, grid_inv_extent,
                    sorted_cells)
        return self._photon_walk_body_packed(
            scene, halton_idx, lane_valid, light_cdf, light_pmf,
            grid_lo, grid_res, grid_inv_extent, sorted_cells)

    def _photon_walk_body_packed(self, scene, halton_idx, lane_valid,
                                 light_cdf, light_pmf,
                                 grid_lo, grid_res, grid_inv_extent,
                                 sorted_cells):
        c = halton_idx.shape[0]
        ri = lambda dim: radical_inverse(dim, halton_idx)

        # Light pick by power distribution (sppm.jl:339-344).
        u_light = ri(0)
        n_lights = light_cdf.shape[0]
        light_num = jnp.minimum(
            jnp.sum((light_cdf < u_light[:, None]).astype(jnp.int32), axis=1),
            n_lights - 1,
        )
        light_pdf = light_pmf[light_num]

        u0 = jnp.stack([ri(1), ri(2)], axis=-1)
        u1 = jnp.stack([ri(3), ri(4)], axis=-1)
        time = m.lerp(
            np.float32(self.camera.shutter_open),
            np.float32(self.camera.shutter_close), ri(5),
        )
        le, o, d, n_l, pdf_pos, pdf_dir = light_mod.sample_le(
            scene.lights, light_num, u0, u1, time,
            tris=scene.triangles, max_area_tris=scene.max_area_tris,
        )
        beta = le * (
            jnp.abs(m.dot(n_l, d))
            / jnp.maximum(light_pdf * pdf_pos * pdf_dir, 1e-20)
        )[:, None]
        active = (
            lane_valid & (pdf_pos > 0) & (pdf_dir > 0) & (light_pdf > 0)
            & ~spec.is_black(le) & ~spec.is_black(beta)
        )
        beta_y0 = jnp.maximum(spec.to_y(beta), 1e-20)

        n_splat_levels = self.max_depth - 1
        vary_src = jnp.zeros((1, c), F32) + beta_y0 * 0.0  # varying zeros
        splats = jax.tree.map(
            lambda x: x + 0,  # no-op; keep tree structure explicit
            dict(
                p=jnp.zeros((n_splat_levels, c, 3), F32),
                d=jnp.zeros((n_splat_levels, c, 3), F32),
                beta=jnp.zeros((n_splat_levels, c, 3), F32),
                start=jnp.zeros((n_splat_levels, c), jnp.int32),
                count=jnp.zeros((n_splat_levels, c), jnp.int32),
            ),
        )
        splats = jax.tree.map(
            lambda x: x + jnp.reshape(
                vary_src, (1, c) + (1,) * (x.ndim - 2)
            ).astype(x.dtype),
            splats,
        )

        def body(depth, carry):
            # depth traced (1-based); Halton dims 6 + 3*(depth-1)..
            o, d, time, beta, active, splats = carry
            hit = scene.intersect(o, d, jnp.full((c,), jnp.inf, F32), time)
            live = active & hit.valid

            # Record splat for depth >= 2: photon cell -> sorted-entry
            # range (sppm.jl:377-401). Slot depth-2 is masked out at
            # depth 1 (clipped to 0 but count forced to 0).
            in_bounds, g = _to_grid(hit.p, grid_lo, grid_res, grid_inv_extent)
            cell = _hash_cells(g[:, 0], g[:, 1], g[:, 2], self.n_pixels)
            start = jnp.searchsorted(
                sorted_cells, cell, side="left"
            ).astype(jnp.int32)
            end = jnp.searchsorted(
                sorted_cells, cell, side="right"
            ).astype(jnp.int32)
            ok = live & in_bounds & (depth > 1)
            slot = jnp.maximum(depth - 2, 0)
            upd = lambda buf, val: buf.at[slot].set(
                jnp.where(
                    ok.reshape((c,) + (1,) * (val.ndim - 1)) & (depth > 1),
                    val, buf[slot],
                )
            )
            splats = dict(
                p=upd(splats["p"], hit.p),
                d=upd(splats["d"], d),
                beta=upd(splats["beta"], beta),
                start=upd(splats["start"], start),
                count=upd(splats["count"], jnp.where(ok, end - start, 0)),
            )

            hit = replace(hit, valid=live)
            lobes = compute_scattering(
                scene.materials, hit, allow_multiple_lobes=True,
                mode=lb.IMPORTANCE,
            )
            dim = 6 + 3 * (depth - 1)
            u_bsdf = jnp.stack([ri(dim), ri(dim + 1)], axis=-1)
            bs = B.sample_f(lobes, -d, u_bsdf, lb.BSDF_ALL, mode=lb.IMPORTANCE)
            ok2 = live & (bs.pdf > 0) & ~spec.is_black(bs.f)
            beta_new = beta * bs.f * (
                jnp.abs(m.dot(bs.wi, hit.ns)) / jnp.maximum(bs.pdf, 1e-20)
            )[:, None]
            # Russian roulette vs the INITIAL β (sppm.jl:421-430). The
            # reference never commits β_new (its update is commented out);
            # replicated for parity.
            q = jnp.maximum(0.0, 1.0 - spec.to_y(beta_new) / beta_y0)
            u_rr = ri(dim + 2)
            active = ok2 & (u_rr >= q)
            o = jnp.where(active[:, None], hit.p + SPAWN_EPS * bs.wi, o)
            d = jnp.where(active[:, None], bs.wi, d)
            time = jnp.where(active, hit.time, time)
            return (o, d, time, beta, active, splats)

        carry = (o, d, time, beta, active, splats)
        carry = jax.lax.fori_loop(1, self.max_depth + 1, body, carry)
        splats = carry[-1]
        return {k: v.reshape((-1,) + v.shape[2:]) for k, v in splats.items()}

    # ------------------------------------------------------------------
    # Phase 4: pair reduction
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1, 2))
    def _pair_pass(self, phi, m_cnt, pair_base, total, offsets,
                   sp_p, sp_d, sp_beta, sp_start,
                   vp: VisiblePoints, radius, sorted_vp):
        return self._pair_body(
            phi, m_cnt, pair_base, total, offsets, sp_p, sp_d, sp_beta,
            sp_start, vp, radius, sorted_vp, self.pair_chunk,
        )

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1, 2))
    def _pair_loop(self, phi, m_cnt, total, offsets,
                   sp_p, sp_d, sp_beta, sp_start,
                   vp: VisiblePoints, radius, sorted_vp):
        """Whole pair reduction as one device-side while_loop over
        fixed-size chunks. ``total`` stays a traced scalar — no host sync
        per iteration (a d2h readback would both serialize the SPPM loop
        and permanently degrade the TPU relay's dispatch latency)."""
        chunk = self.pair_chunk

        def cond(carry):
            base, _, _ = carry
            return base < total

        def body(carry):
            base, phi, m_cnt = carry
            phi, m_cnt = self._pair_body(
                phi, m_cnt, base, total, offsets, sp_p, sp_d, sp_beta,
                sp_start, vp, radius, sorted_vp, chunk,
            )
            return (base + jnp.int32(chunk), phi, m_cnt)

        _, phi, m_cnt = jax.lax.while_loop(
            cond, body, (jnp.int32(0), phi, m_cnt)
        )
        return phi, m_cnt

    def _pair_body(self, phi, m_cnt, pair_base, total, offsets,
                   sp_p, sp_d, sp_beta, sp_start,
                   vp: VisiblePoints, radius, sorted_vp, chunk: int):
        """Accumulate one fixed-size chunk of (photon, visible-point)
        candidate pairs into (phi, M) with deterministic scatter-adds.
        Pure (unjitted) so it can also run under shard_map.

        Round-5 planar form: the per-pair reads pack into TWO row
        matrices — a [P, 55] visible-point table (p, radius, valid, wo,
        frame + both compact lobe slots; ints bitcast to f32) and a
        [S, 10] splat table — so a pair costs 2 row gathers instead of
        ~20 per-field gathers, and the BSDF f evaluates through the
        planar shade module (full-lane-occupancy components,
        ARCHITECTURE §7c). The table builds are loop-invariant, so XLA
        hoists them out of the pair while_loop. Values match the packed
        form to f32 association (pair-oracle test)."""
        from ..core import vec as V
        from ..core.vec import V3
        from ..wavefront import shade as S

        j = pair_base + jnp.arange(chunk, dtype=jnp.int32)
        in_range = j < total
        s = jnp.clip(
            jnp.searchsorted(offsets, j, side="right") - 1,
            0, offsets.shape[0] - 1,
        )
        k = j - offsets[s]
        entry = sp_start[s] + k
        entry = jnp.clip(entry, 0, sorted_vp.shape[0] - 1)
        vp_id = sorted_vp[entry]

        bc_i = lambda x: jax.lax.bitcast_convert_type(
            x.astype(jnp.int32), F32)
        lob = vp.lobes
        vp_cols = [
            vp.p[:, 0], vp.p[:, 1], vp.p[:, 2], radius,
            vp.valid.astype(F32),
            vp.wo[:, 0], vp.wo[:, 1], vp.wo[:, 2],
            lob.ng[:, 0], lob.ng[:, 1], lob.ng[:, 2],
            lob.ns[:, 0], lob.ns[:, 1], lob.ns[:, 2],
            lob.ss[:, 0], lob.ss[:, 1], lob.ss[:, 2],
            lob.ts[:, 0], lob.ts[:, 1], lob.ts[:, 2],
            lob.eta,
        ]
        for sl in range(VP_LOBES):
            vp_cols += [
                bc_i(lob.kind[:, sl]),
                lob.c0[:, sl, 0], lob.c0[:, sl, 1], lob.c0[:, sl, 2],
                lob.c1[:, sl, 0], lob.c1[:, sl, 1], lob.c1[:, sl, 2],
                lob.eta_a[:, sl], lob.eta_b[:, sl],
                lob.a[:, sl], lob.b[:, sl],
                bc_i(lob.fr_kind[:, sl]),
                lob.fr_eta[:, sl, 0], lob.fr_eta[:, sl, 1],
                lob.fr_eta[:, sl, 2],
                lob.fr_k[:, sl, 0], lob.fr_k[:, sl, 1],
                lob.fr_k[:, sl, 2],
            ]
        vp_rows = jnp.moveaxis(jnp.stack(vp_cols, axis=0), 0, -1)
        sp_rows = jnp.moveaxis(jnp.stack([
            sp_p[:, 0], sp_p[:, 1], sp_p[:, 2],
            sp_d[:, 0], sp_d[:, 1], sp_d[:, 2],
            sp_beta[:, 0], sp_beta[:, 1], sp_beta[:, 2],
        ], axis=0), 0, -1)

        g = jnp.moveaxis(vp_rows[vp_id], -1, 0)     # [55, pairs]
        h = jnp.moveaxis(sp_rows[s], -1, 0)         # [9, pairs]
        un_i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)

        vpp = V3(g[0], g[1], g[2])
        r = g[3]
        valid = g[4] != 0.0
        wo = V3(g[5], g[6], g[7])
        slots = []
        base = 21
        for sl in range(VP_LOBES):
            o_ = base + sl * 18
            slots.append(S.LobeSlotP(
                kind=un_i(g[o_]),
                c0=V3(g[o_ + 1], g[o_ + 2], g[o_ + 3]),
                c1=V3(g[o_ + 4], g[o_ + 5], g[o_ + 6]),
                eta_a=g[o_ + 7], eta_b=g[o_ + 8],
                a=g[o_ + 9], b=g[o_ + 10],
                fr_kind=un_i(g[o_ + 11]),
                fr_eta=V3(g[o_ + 12], g[o_ + 13], g[o_ + 14]),
                fr_k=V3(g[o_ + 15], g[o_ + 16], g[o_ + 17]),
            ))
        lo_p = S.LobesP(
            slots=tuple(slots),
            ng=V3(g[8], g[9], g[10]), ns=V3(g[11], g[12], g[13]),
            ss=V3(g[14], g[15], g[16]), ts=V3(g[17], g[18], g[19]),
            eta=g[20],
        )
        spp_ = V3(h[0], h[1], h[2])
        spd_ = V3(h[3], h[4], h[5])
        spb = V3(h[6], h[7], h[8])

        diff = vpp - spp_
        d2 = diff.length_squared()
        ok = in_range & valid & (d2 <= r * r)

        f_val = S.f(lo_p, wo, -spd_, lb.BSDF_ALL)
        contrib_v = V.where(ok, spb * f_val, 0.0)
        contrib = jnp.moveaxis(
            jnp.stack([contrib_v.x, contrib_v.y, contrib_v.z], 0), 0, -1)
        phi = phi.at[vp_id].add(contrib)
        m_cnt = m_cnt.at[vp_id].add(ok.astype(jnp.int32))
        return phi, m_cnt

    # ------------------------------------------------------------------
    # Phase 5: pixel update + image
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0,))
    def _update_pixels(self, state: SPPMState, ld_add, gamma=np.float32(2 / 3)):
        """(sppm.jl:438-459)."""
        has = state.m > 0
        mf = state.m.astype(F32)
        n_new = state.n + gamma * mf
        r_new = state.radius * jnp.sqrt(
            n_new / jnp.maximum(state.n + mf, 1e-20)
        )
        tau_new = (state.tau + state.phi) * (
            (r_new / jnp.maximum(state.radius, 1e-20)) ** 2
        )[:, None]
        z3 = jnp.zeros_like(state.phi)
        return SPPMState(
            ld=state.ld + ld_add,
            tau=jnp.where(has[:, None], tau_new, state.tau),
            radius=jnp.where(has, r_new, state.radius),
            n=jnp.where(has, n_new, state.n),
            phi=z3,
            m=jnp.zeros_like(state.m),
        )

    def to_image(self, state: SPPMState, iteration: int):
        """(sppm.jl:461-472) -> [H, W, 3] rgb."""
        film = self.camera.film
        np_total = iteration * self.photons_per_iteration * np.pi
        img = state.ld / iteration + state.tau / (
            np_total * jnp.maximum(state.radius, 1e-20) ** 2
        )[:, None]
        return img.reshape(film.height, film.width, 3)

    # ------------------------------------------------------------------
    # Main loop (sppm.jl:132-173)
    # ------------------------------------------------------------------

    def _pixel_grid(self):
        film = self.camera.film
        xs = np.arange(film.crop_min[0], film.crop_max[0] + 1, dtype=np.int32)
        ys = np.arange(film.crop_min[1], film.crop_max[1] + 1, dtype=np.int32)
        gx, gy = np.meshgrid(xs, ys, indexing="xy")
        return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)

    def render(self, scene, n_iterations: int | None = None,
               progress: bool = False, state: SPPMState | None = None,
               start_iteration: int = 1,
               checkpoint_path: str | None = None,
               geometry=None, geometry_transform=None) -> SPPMState:
        """Run SPPM iterations. Pass (state, start_iteration) from a prior
        run (or utils.checkpoint.load_pytree) to resume bit-exactly — a
        capability the reference lacks (its radius/tau/N state is never
        serialized, SURVEY.md §5).

        ``geometry`` (optional): a Triangles pytree with the scene's
        topology but moved vertices — the animated-geometry path
        (common.prepare_geometry): the accelerator is rebuilt on device
        and threaded into the jitted passes as a traced argument, so
        every animation frame reuses compiled executables. Single-chip
        paths only (the sharded camera/photon passes keep static
        geometry). ``geometry_transform`` (optional) applies a Transform
        to ``geometry`` on device, fused with the rebuild into one
        dispatch — pass the resident base mesh plus the frame's Transform
        for rigid motion."""
        iters = n_iterations or self.n_iterations
        geom = common.prepare_geometry(scene, geometry, geometry_transform)
        if geom is not None and self.mesh is not None:
            raise NotImplementedError(
                "animated geometry is single-chip for now: the sharded "
                "SPPM passes bake geometry in at trace time"
            )
        if light_mod.num_lights(scene.lights) == 0:
            raise ValueError(
                "SPPM requires at least one light (the photon pass samples "
                "the light power distribution, sppm.jl:564-569)"
            )
        if state is None:
            state = initial_state(self.n_pixels, self.initial_search_radius)
        pixels = self._pixel_grid()
        key = jax.random.key(self.seed)
        light_cdf = common.light_power_cdf(scene)
        prev = jnp.concatenate([jnp.zeros(1, F32), light_cdf[:-1]])
        light_pmf = light_cdf - prev

        # Progressive snapshots stay ON DEVICE until the loop finishes:
        # a device->host readback mid-run permanently degrades the TPU
        # relay's dispatch latency (~20us -> ~3ms measured, async copies
        # included), so one mid-run PNG write would slow every remaining
        # iteration ~100x. Checkpointing (opt-in durability) still writes
        # immediately — the user traded throughput for resumability.
        pending = None
        fused = (self.fused_iterations and self.mesh is None
                 and self.stats is None
                 and not progress and not checkpoint_path)
        if fused:
            # Single-chip fast path: whole blocks of iterations run as
            # ONE dispatch (_iterations_fused); the host only steps in at
            # snapshot boundaries.
            chunk = min(self.pixel_chunk, pixels.shape[0])
            pad = (-pixels.shape[0]) % chunk
            part = np.concatenate([pixels, np.zeros((pad, 2), np.int32)])
            lane_valid = np.concatenate(
                [np.ones(pixels.shape[0], bool), np.zeros(pad, bool)]
            )
            part_j, valid_j = jnp.asarray(part), jnp.asarray(lane_valid)
            lights_dev = self._lights_device(scene)
            it = start_iteration
            while it <= iters:
                if self.write_frequency:
                    stop = min(
                        iters,
                        ((it - 1) // self.write_frequency + 1)
                        * self.write_frequency,
                    )
                else:
                    stop = iters
                # Cap the dispatch length: a bounded block is one compile
                # (shared by every full block) and stays under the relay's
                # fault threshold for long fused programs.
                stop = min(stop, it + self.fused_block - 1)
                state = self._iterations_fused(
                    scene, state, stop - it + 1, jnp.int32(it),
                    part_j, valid_j, key, light_cdf, light_pmf, lights_dev,
                    geom,
                )
                if self.write_frequency and (
                    stop % self.write_frequency == 0 or stop == iters
                ):
                    pending = self.to_image(state, stop)
                it = stop + 1
        else:
            for it in range(start_iteration, iters + 1):
                state = self.step(scene, state, it, pixels, key,
                                  light_cdf, light_pmf, geom)
                if progress:
                    print(f"sppm iteration {it}/{iters}", flush=True)
                if self.write_frequency and (
                    it % self.write_frequency == 0 or it == iters
                ):
                    # Device-side snapshot; successive writes overwrite
                    # the same file (film.jl:167-171 semantics), so only
                    # the newest needs flushing.
                    pending = self.to_image(state, it)
                if checkpoint_path:
                    from ..utils.checkpoint import save_pytree

                    save_pytree(checkpoint_path, state,
                                metadata={"iteration": it})
        if pending is not None:
            film = self.camera.film
            film.save_png(film.set_image(pending))
        return state

    def _lights_device(self, scene):
        """Light table as a traced jit arg: animated relights reuse the
        compiled passes. Uploaded once per light-table object."""
        cache = getattr(self, "_lights_cache", None)
        if cache is None or cache[0] is not scene.lights:
            cache = (scene.lights, jax.tree.map(jnp.asarray, scene.lights))
            self._lights_cache = cache
        return cache[1]

    def fused_cost_analysis(self, scene, n_iters: int = 1):
        """XLA cost analysis (flops, bytes accessed) of the compiled
        fused-iteration executable — the numerators for bench.py's SPPM
        roofline. Mirrors render()'s fused-path call shapes exactly, so
        after a render this compiles from the persistent cache. The
        byte count is XLA's static HLO estimate of memory traffic, not a
        hardware counter — an idealized-traffic roofline."""
        pixels = self._pixel_grid()
        chunk = min(self.pixel_chunk, pixels.shape[0])
        pad = (-pixels.shape[0]) % chunk
        part = np.concatenate([pixels, np.zeros((pad, 2), np.int32)])
        lane_valid = np.concatenate(
            [np.ones(pixels.shape[0], bool), np.zeros(pad, bool)]
        )
        state = initial_state(self.n_pixels, self.initial_search_radius)
        key = jax.random.key(self.seed)
        light_cdf = common.light_power_cdf(scene)
        prev = jnp.concatenate([jnp.zeros(1, F32), light_cdf[:-1]])
        light_pmf = light_cdf - prev
        # .lower on the bound method drops the binding — go through the
        # class attribute with self as the (static) first argument.
        lowered = type(self)._iterations_fused.lower(
            self, scene, state, n_iters, jnp.int32(1), jnp.asarray(part),
            jnp.asarray(lane_valid), key, light_cdf, light_pmf,
            self._lights_device(scene), None,
        )
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return ca

    @functools.partial(jax.jit, static_argnums=(0, 1, 3))
    def _iterations_fused(self, scene, state: SPPMState, n_iters: int,
                          it_start, pixels, lane_valid, key,
                          light_cdf, light_pmf, lights,
                          geom=None) -> SPPMState:
        """``n_iters`` full SPPM iterations as ONE dispatch — the whole
        five-phase loop (camera, grid, photons, pair reduction, pixel
        update) is device-side with no host round-trips. Key schedule,
        Halton indexing and splat layout match step() exactly. Used by
        render() between snapshot/checkpoint boundaries on the
        single-chip path."""
        return self._iterations_body(
            scene, state, n_iters, it_start, pixels, lane_valid, key,
            light_cdf, light_pmf, lights, geom,
        )

    def _iterations_body(self, scene, state: SPPMState, n_iters: int,
                         it_start, pixels, lane_valid, key,
                         light_cdf, light_pmf, lights,
                         geom=None) -> SPPMState:
        """Traceable core of _iterations_fused (also mapped per frame by
        _frames_fused)."""
        n_pix = self.n_pixels
        np_iter = self.photons_per_iteration

        def body(k, st):
            it = it_start + k
            it_key = jax.random.fold_in(key, it)
            ld_add, vp = self._camera_pass_all(
                scene, pixels, lane_valid, it_key, lights, geom
            )
            ld_add = ld_add[:n_pix]
            vp = jax.tree.map(lambda x: x[:n_pix], vp)
            grid = self._build_grid(vp, st.radius)
            halton_base = (
                (it.astype(jnp.uint32) - jnp.uint32(1))
                * jnp.uint32(np_iter)
            )
            splat = self._photon_walk_all(
                scene, halton_base, light_cdf, light_pmf,
                grid["lo"], grid["res"], grid["inv_extent"],
                grid["sorted_cells"], lights, geom,
            )
            counts = splat["count"]
            offsets = jnp.concatenate(
                [jnp.zeros(1, jnp.int32),
                 jnp.cumsum(counts, dtype=jnp.int32)]
            )[:-1]
            phi, m_cnt = self._pair_loop(
                st.phi, st.m, jnp.sum(counts).astype(jnp.int32), offsets,
                splat["p"], splat["d"], splat["beta"], splat["start"],
                vp, st.radius, grid["sorted_vp"],
            )
            st = SPPMState(st.ld, st.tau, st.radius, st.n, phi, m_cnt)
            return self._update_pixels(st, ld_add)

        if self.fused_unroll:
            for k in range(n_iters):
                state = body(jnp.int32(k), state)
            return state
        return jax.lax.fori_loop(0, n_iters, body, state)

    @functools.partial(jax.jit, static_argnums=(0, 1, 3, 9))
    def _frames_fused(self, scene, states: SPPMState, n_iters: int,
                      it_start, pixels, lane_valid, key, lights_stack,
                      leaf: int, xf_stack=None, base_tris=None):
        """``n_iters`` SPPM iterations of K animation frames as ONE
        dispatch: lax.map over stacked per-frame light tables, states
        (and optionally per-frame rigid Transforms of a shared base mesh
        — transform + Morton re-cluster run inside the mapped body).
        ``states`` carries each frame's SPPMState ([K, ...] leaves) in
        and out, so render_frames can chunk the iteration axis across
        dispatches (the fused_block cap) without changing results: each
        frame is an independent SPPM run with the integrator's seed,
        equal to K sequential render() calls frame-for-frame (tested)."""
        from ..accel.morton import build_clusters_device
        from ..shapes.triangle import transform_triangles

        def one(frame):
            lights, xf, state = frame
            if base_tris is None:
                geom = None
            else:
                tris_f = transform_triangles(base_tris, xf)
                geom = (tris_f, build_clusters_device(tris_f, leaf))
            # Per-frame power distribution (lights move/recolor per frame).
            p = spec.to_y(light_mod.power(lights))
            cdf = jnp.cumsum(p / jnp.maximum(jnp.sum(p), 1e-20))
            pmf = cdf - jnp.concatenate([jnp.zeros(1, F32), cdf[:-1]])
            return self._iterations_body(
                scene, state, n_iters, it_start, pixels, lane_valid,
                key, cdf, pmf, lights, geom,
            )

        return jax.lax.map(one, (lights_stack, xf_stack, states))

    def render_frames(self, scene, frame_lights, n_iterations: int | None = None,
                      geometry=None, frame_transforms=None) -> SPPMState:
        """Batch-render an animation: K frames, each ``n_iterations`` SPPM
        iterations from a fresh state, in a handful of device dispatches.

        The TPU-native form of the reference's per-frame loop
        (docs/code/caustic_moving.jl:49-100): where per-frame render()
        calls pay the host round-trip and dispatch latency K times,
        this pays it once per iteration block — the frame loop runs on
        device via lax.map. Like render()'s fused path, each dispatch is
        capped at ``fused_block`` total sequential iteration bodies
        (K frames × B iterations per dispatch; long uncapped fused
        dispatches faulted the TPU runtime, see __init__): per-frame
        states thread through the blocks, so results are independent of
        the cap (tested).

        - ``frame_lights``: list of K per-frame light-entry lists (as from
          models.caustic_moving.frame_lights), packed/preprocessed here
          against the scene bounds; every frame must have the same number
          of lights (stacked into one [K, L, ...] traced table).
        - ``geometry`` + ``frame_transforms``: optional shared base
          Triangles plus K rigid Transforms — each frame's vertex
          transform and Morton re-cluster also run inside the dispatch.

        Returns the stacked SPPMState ([K, ...] leaves); slice frame k
        with ``jax.tree.map(lambda x: x[k], states)`` and convert via
        ``to_image``. Single-chip path (like the other animated-geometry
        entry points)."""
        assert self.mesh is None, "render_frames is a single-chip path"
        iters = n_iterations or self.n_iterations
        tris_host = getattr(scene, "triangles_host", scene.triangles)
        center = (scene.world_lo + scene.world_hi) / 2
        radius = float(np.linalg.norm(scene.world_hi - center))
        tables = [
            light_mod.preprocess(
                light_mod.pack_lights(entries, tris_host), center, radius)
            for entries in frame_lights
        ]
        n_l = {light_mod.num_lights(t) for t in tables}
        assert len(n_l) == 1, f"frames must have equal light counts: {n_l}"
        lights_stack = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *tables)

        base_tris = xf_stack = None
        leaf = 0
        if geometry is not None:
            assert frame_transforms is not None and \
                len(frame_transforms) == len(tables)
            base_tris = jax.tree.map(jnp.asarray, geometry)
            xf_stack = jax.tree.map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                *frame_transforms)
            leaf = 32 if scene.n_triangles < 300_000 else 64

        k_frames = len(tables)
        state0 = initial_state(self.n_pixels, self.initial_search_radius)
        states = jax.tree.map(
            lambda x: jnp.broadcast_to(
                jnp.asarray(x), (k_frames,) + jnp.shape(x)), state0)
        pixels = self._pixel_grid()
        chunk = min(self.pixel_chunk, pixels.shape[0])
        pad = (-pixels.shape[0]) % chunk
        part = np.concatenate([pixels, np.zeros((pad, 2), np.int32)])
        lane_valid = np.concatenate(
            [np.ones(pixels.shape[0], bool), np.zeros(pad, bool)])
        part = jnp.asarray(part)
        lane_valid = jnp.asarray(lane_valid)
        key = jax.random.key(self.seed)

        # Dispatch-length cap: each _frames_fused call runs K × B
        # sequential iteration bodies; keep that within fused_block (one
        # iteration per frame minimum).
        block = max(1, self.fused_block // k_frames)
        it = 1
        while it <= iters:
            n = min(block, iters - it + 1)
            states = self._frames_fused(
                scene, states, n, jnp.int32(it), part, lane_valid,
                key, lights_stack, leaf, xf_stack, base_tris,
            )
            it += n
        return states

    def step(self, scene, state: SPPMState, iteration: int, pixels, key,
             light_cdf, light_pmf, geom=None) -> SPPMState:
        assert geom is None or self.mesh is None, \
            "animated geometry is single-chip (sharded passes are static)"
        n_pix = pixels.shape[0]
        chunk = min(self.pixel_chunk, n_pix)
        it_key = jax.random.fold_in(key, iteration)
        lights_dev = self._lights_device(scene)

        # 1) Camera pass (chunked, or SPMD over the mesh when opted in).
        if self.mesh is not None and self.shard_camera:
            from ..parallel.sppm import camera_pass_sharded

            ndev = self.mesh.devices.size
            pad = (-n_pix) % ndev
            part = np.concatenate([pixels, np.zeros((pad, 2), np.int32)])
            valid = np.concatenate(
                [np.ones(n_pix, bool), np.zeros(pad, bool)]
            )
            ld_add, vp = camera_pass_sharded(
                self, scene, self.mesh, self.shard_axis,
                jnp.asarray(part), jnp.asarray(valid), it_key,
            )
            ld_add = ld_add[:n_pix]
            vp = jax.tree.map(lambda x: x[:n_pix], vp)
        else:
            # All chunks in one dispatch (bit-identical key schedule to
            # the per-chunk python loop — see _camera_pass_all).
            pad = (-n_pix) % chunk
            part = np.concatenate([pixels, np.zeros((pad, 2), np.int32)])
            valid = np.concatenate(
                [np.ones(n_pix, bool), np.zeros(pad, bool)]
            )
            ld_add, vp = self._camera_pass_all(
                scene, jnp.asarray(part), jnp.asarray(valid), it_key,
                lights_dev, geom,
            )
            ld_add = ld_add[:n_pix]
            vp = jax.tree.map(lambda x: x[:n_pix], vp)

        # 2) Grid.
        grid = self._build_grid(vp, state.radius)

        # 3) Photon walk (chunked, or SPMD over the mesh photon axis).
        np_iter = self.photons_per_iteration
        halton_base = np.uint32((iteration - 1) * np_iter)
        if self.mesh is not None:
            from ..parallel.sppm import photon_walk_sharded

            ndev = self.mesh.devices.size
            npad = -(-np_iter // ndev) * ndev
            idx = halton_base + np.arange(npad, dtype=np.uint32)
            valid = np.arange(npad) < np_iter
            splat = photon_walk_sharded(
                self, scene, self.mesh, self.shard_axis,
                jnp.asarray(idx), jnp.asarray(valid), light_cdf, light_pmf,
                grid["lo"], grid["res"], grid["inv_extent"],
                grid["sorted_cells"],
            )
        else:
            # All photon chunks in one dispatch; layout identical to the
            # per-chunk python loop (see _photon_walk_all).
            splat = self._photon_walk_all(
                scene, jnp.uint32(halton_base), light_cdf, light_pmf,
                grid["lo"], grid["res"], grid["inv_extent"],
                grid["sorted_cells"], lights_dev, geom,
            )

        # 4) Pair expansion + reduction.
        counts = splat["count"]
        offsets = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
        )[:-1]
        # ``total`` stays on device on the single-chip path (the while
        # loop below consumes the traced scalar); only the sharded path
        # and opt-in stats need the host value.
        need_host_total = self.mesh is not None or self.stats is not None
        total = int(jnp.sum(counts)) if need_host_total else None
        if self.stats is not None:
            self.stats.add("photons_traced", np_iter)
            self.stats.add("photon_vp_pairs", total)
            self.stats.add("camera_rays", n_pix)
            self.stats.add(
                "rays_dispatched",
                n_pix * self.max_depth * 2 + np_iter * self.max_depth,
            )
            # Grid occupancy (SURVEY §5 observability): distinct occupied
            # cells vs live visible points this iteration. Host syncs are
            # fine here — stats is opt-in (see need_host_total above).
            sc = grid["sorted_cells"]
            occupied = jnp.sum(
                (sc[1:] != sc[:-1]) & (sc[1:] < self.n_pixels)
            ) + (sc[0] < self.n_pixels).astype(jnp.int32)
            self.stats.add("grid_cells_occupied", int(occupied))
            self.stats.add(
                "visible_points",
                int(jnp.sum(vp.valid & ~spec.is_black(vp.beta))),
            )
        phi, m_cnt = state.phi, state.m
        if self.mesh is not None:
            from ..parallel.sppm import pair_pass_sharded

            ndev = self.mesh.devices.size
            super_chunk = ndev * self.pair_chunk
            for base in range(0, total, super_chunk):
                bases = jnp.arange(ndev, dtype=jnp.int32) * self.pair_chunk \
                    + jnp.int32(base)
                phi, m_cnt = pair_pass_sharded(
                    self, self.mesh, self.shard_axis, phi, m_cnt,
                    jnp.int32(total), offsets,
                    splat["p"], splat["d"], splat["beta"], splat["start"],
                    vp, state.radius, grid["sorted_vp"],
                    super_chunk, bases,
                )
        else:
            phi, m_cnt = self._pair_loop(
                phi, m_cnt, jnp.sum(counts).astype(jnp.int32), offsets,
                splat["p"], splat["d"], splat["beta"], splat["start"],
                vp, state.radius, grid["sorted_vp"],
            )
        state = SPPMState(state.ld, state.tau, state.radius, state.n,
                          phi, m_cnt)

        # 5) Update.
        return self._update_pixels(state, ld_add)

    def save(self, state: SPPMState, iteration: int, path: str | None = None):
        film = self.camera.film
        img = self.to_image(state, iteration)
        film_state = film.set_image(img)
        return film.save_png(film_state, path)

    def __call__(self, scene):
        state = self.render(scene)
        self.save(state, self.n_iterations)
        return state
