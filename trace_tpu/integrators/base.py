"""Shared sampler-integrator render loop.

TPU-native counterpart of the reference's generic SamplerIntegrator render
loop (/root/reference/src/integrators/sampler.jl:12-56): instead of
threaded 16x16 film tiles, the film sample grid is processed as padded
fixed-shape pixel chunks, one jitted single-sample pass per chunk, with
deterministic filter-footprint accumulation into the functional film state.
Subclasses provide ``li(scene, rd, key) -> [N, 3]``.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.ray import scale_differentials
from ..film.film import FilmState
from ..sampler import uniform as U
from ..sampler.uniform import UniformSampler
from . import common

F32 = jnp.float32


class SamplerIntegrator:
    def __init__(self, camera, sampler: UniformSampler | None = None,
                 max_depth: int = 5, pixel_chunk: int = 1 << 16,
                 stats=None, spp_per_dispatch: int | None = None):
        self.camera = camera
        self.sampler = sampler or UniformSampler(1)
        self.max_depth = int(max_depth)
        self.pixel_chunk = int(pixel_chunk)
        self.stats = stats
        # Cap on samples per DISPATCH: the TPU runtime (through the
        # relay) kills dispatches whose execution span runs too long
        # (ARCHITECTURE §7d — the config-4 "kernel fault"). Heavy
        # scenes set this to split the per-chunk spp loop across
        # pipelined dispatches (state-threaded, bit-identical keys);
        # None keeps the single-dispatch fast path.
        self.spp_per_dispatch = (int(spp_per_dispatch)
                                 if spp_per_dispatch else None)

    def li(self, scene, rd, key):
        raise NotImplementedError

    def __call__(self, scene, save: bool = True):
        state = self.render(scene)
        if save:
            self.camera.film.save_png(state)
        return state

    def _pixel_grid(self):
        film = self.camera.film
        (x0, y0), (x1, y1) = film.sample_bounds()
        xs = np.arange(x0, x1 + 1, dtype=np.int32)
        ys = np.arange(y0, y1 + 1, dtype=np.int32)
        gx, gy = np.meshgrid(xs, ys, indexing="xy")
        return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)

    def _li_with_aux(self, scene, rd, key):
        """``(l, aux_dict)`` of device i32 counters accumulated across
        chunks/samples: ``queue_drops`` (Whitted specular overflow) and
        ``useful_rays`` (live-lane closest + shadow rays per wavefront
        level — the honest Mrays numerator, vs. the dispatch count that
        includes masked-dead lanes). Integrators with counters override
        this; the default reports zeros."""
        z = jnp.sum(rd.o[..., 0] * 0.0).astype(jnp.int32)
        return self.li(scene, rd, key), {"queue_drops": z, "useful_rays": z}

    def _stratum_arrays(self, s):
        """(lo, scale) for traced sample index s — confines film jitter to
        the sampler's stratum; identity for the uniform sampler."""
        if hasattr(self.sampler, "stratum"):
            xs = jnp.float32(self.sampler.x_samples)
            ys = jnp.float32(self.sampler.y_samples)
            sf = s.astype(jnp.float32)
            sx = jnp.mod(sf, xs)
            sy = jnp.floor(sf / xs)
            lo = jnp.stack([sx / xs, sy / ys])
            scale = jnp.stack([1.0 / xs, 1.0 / ys])
            return lo, scale
        return jnp.zeros(2, jnp.float32), jnp.ones(2, jnp.float32)

    @functools.partial(jax.jit, static_argnums=(0, 1),
                       donate_argnums=(2, 3))
    def _chunk_pass(self, scene, state: FilmState, aux, pixels, lane_valid,
                    chunk_key, lights, geom=None):
        """All spp samples for one chunk in ONE dispatch: a lax.fori_loop
        over the per-sample pass. One compile per chunk shape (the body is
        traced once regardless of spp); no per-sample host round-trips —
        each dispatch through the TPU tunnel costs ~0.4 ms, which at spp
        dispatch granularity was most of the frame time.

        ``lights`` is the scene's light table threaded in as a TRACED
        argument (uploaded once per render): animated relights reuse this
        executable instead of re-tracing (see Scene.with_lights).
        ``geom`` (optional) is a TRACED (Triangles, ClusterAccel) pair —
        animated geometry reuses the executable the same way (see
        render(geometry=...) and Scene.with_geometry)."""
        scene = common.apply_geometry(scene.with_lights(lights), geom)
        spp = self.sampler.samples_per_pixel

        def body(s, carry):
            lo, scale = self._stratum_arrays(s)
            return self._sample_body(
                scene, carry, pixels, lane_valid,
                jax.random.fold_in(chunk_key, s), lo, scale,
            )

        return jax.lax.fori_loop(0, spp, body, (state, aux))

    @functools.partial(jax.jit, static_argnums=(0, 1, 8),
                       donate_argnums=(2, 3))
    def _chunk_pass_block(self, scene, state: FilmState, aux, pixels,
                          lane_valid, chunk_key, lights, n_samples: int,
                          s0, geom=None):
        """``n_samples`` samples starting at global sample index ``s0``
        (traced — one executable serves every block) for one chunk:
        the dispatch-span-capped form of _chunk_pass. Keys fold the
        GLOBAL sample index, so any block split is bit-identical to the
        monolithic loop."""
        scene = common.apply_geometry(scene.with_lights(lights), geom)

        def body(i, carry):
            s = s0 + i
            lo, scale = self._stratum_arrays(s)
            return self._sample_body(
                scene, carry, pixels, lane_valid,
                jax.random.fold_in(chunk_key, s), lo, scale,
            )

        return jax.lax.fori_loop(0, n_samples, body, (state, aux))

    def _sample_body(self, scene, carry, pixels, lane_valid, key, lo, scale):
        """Unjitted per-sample body of _chunk_pass; carry = (film state,
        aux counter)."""
        state, aux = carry
        spp = self.sampler.samples_per_pixel
        # Identity-keyed randomness: every draw hangs off the PIXEL's
        # raster id (not its position in the chunk), so the rendered
        # image is bit-invariant to pixel_chunk and identical in the
        # sharded path (parallel/render.py runs this same derivation).
        ks = U.lane_keys(key, U.pixel_ids(pixels))
        p_film, u_lens, u_time = U.get_camera_samples_lanes(
            U.fold_lanes(ks, 0), pixels
        )
        p_film = pixels.astype(jnp.float32) + lo + (
            p_film - pixels.astype(jnp.float32)
        ) * scale
        rd, weight = self.camera.generate_ray_differentials(
            p_film, u_lens, u_time
        )
        rd = scale_differentials(rd, np.float32(1.0 / np.sqrt(spp)))
        l, aux_s = self._li_with_aux(scene, rd, U.fold_lanes(ks, 1))
        l = common.sanitize_radiance(l)
        film = self.camera.film
        grid = self._film_grid(int(pixels.shape[0]))
        if grid is not None:
            # Full-grid chunk (render()'s raster order): gather-free
            # stencil splat — 34.6 -> ~1 ms per sample pass on v5e
            # (film.add_samples_grid).
            state = film.add_samples_grid(
                state, p_film,
                jnp.where(lane_valid[..., None], l, 0.0),
                jnp.where(lane_valid, weight, 0.0),
                (grid[0], grid[1]), (grid[2], grid[3]),
                valid=lane_valid,
            )
        else:
            state = film.add_samples(
                state, p_film,
                jnp.where(lane_valid[..., None], l, 0.0),
                jnp.where(lane_valid, weight, 0.0),
                valid=lane_valid,
            )
        return state, jax.tree.map(jnp.add, aux, aux_s)

    def _film_grid(self, n_lanes: int):
        """(x0, y0, gh, gw) when ``n_lanes`` can only be the COMPLETE
        sample-bounds raster grid (what render() passes when one chunk
        covers everything — chunks are min(pixel_chunk, n), so equality
        with gh*gw implies full coverage); None otherwise (chunked or
        sharded callers fall back to the scatter splat)."""
        film = self.camera.film
        (x0, y0), (x1, y1) = film.sample_bounds()
        gw, gh = x1 - x0 + 1, y1 - y0 + 1
        if n_lanes == gh * gw:
            return (x0, y0, gh, gw)
        return None

    def render(self, scene, geometry=None,
               geometry_transform=None, geometry_accel=None) -> FilmState:
        """Render the scene. ``geometry`` (optional): a Triangles pytree
        (device arrays or host numpy; same topology/counts as the scene's)
        that REPLACES the scene's triangle table for this render — the
        animated-geometry path. A cluster accelerator is rebuilt from it
        fully on device (Morton sort, accel/morton.py) and both are
        threaded into the jitted passes as traced arguments, so frame 2+
        of an animation reuses every compiled executable: per-frame cost
        is one device rebuild (~ms) instead of a host refit + re-trace
        (minutes through the remote-compile tunnel).

        ``geometry_transform`` (optional): a Transform applied to
        ``geometry`` on device, fused with the accelerator rebuild into a
        single dispatch (common._transform_and_build) — the fast path for
        rigid per-frame motion."""
        from ..lights.lights import num_lights

        film = self.camera.film
        state = film.initial_state()
        pixels = self._pixel_grid()
        n = pixels.shape[0]
        chunk = min(self.pixel_chunk, n)
        spp = self.sampler.samples_per_pixel
        key = jax.random.key(self.sampler.seed)
        geom = common.prepare_geometry(scene, geometry, geometry_transform,
                                       accel=geometry_accel)
        # Light table passed as a traced jit argument — animated relights
        # then reuse compiled executables. Uploaded once per light-table
        # object (relights replace scene.lights wholesale).
        cache = getattr(self, "_lights_cache", None)
        if cache is None or cache[0] is not scene.lights:
            cache = (scene.lights, jax.tree.map(jnp.asarray, scene.lights))
            self._lights_cache = cache
        lights_dev = cache[1]
        if self.stats is not None:
            self.stats.start("render")
            # Per wavefront level: one closest-hit + one shadow ray per
            # light for every queue lane (dispatch count, not a device
            # measurement — dead lanes still occupy queue slots).
            self.stats.add("camera_samples", n * spp)
            self.stats.add(
                "rays_dispatched",
                n * spp * self.max_depth * (1 + num_lights(scene.lights)),
            )
        aux = {"queue_drops": jnp.zeros((), jnp.int32),
               "useful_rays": jnp.zeros((), jnp.int32)}
        for ci, start in enumerate(range(0, n, chunk)):
            part = pixels[start:start + chunk]
            valid = np.ones(part.shape[0], bool)
            if part.shape[0] < chunk:  # pad the tail to keep shapes static
                pad = chunk - part.shape[0]
                part = np.concatenate([part, np.zeros((pad, 2), np.int32)])
                valid = np.concatenate([valid, np.zeros(pad, bool)])
            part, valid = jnp.asarray(part), jnp.asarray(valid)
            # All spp samples for the chunk in one dispatch (the spp loop
            # runs on device — keys/strata are derived inside the jit).
            # The SAME base key goes to every chunk: per-lane streams are
            # pixel-identity-keyed in _sample_body, so chunking is purely
            # a perf knob (sample values are chunk-invariant).
            spd = self.spp_per_dispatch
            if spd is not None and spd < spp:
                # Dispatch-span cap (§7d): sample blocks as pipelined
                # state-threaded dispatches, bit-identical keys.
                for s0 in range(0, spp, spd):
                    ns = min(spd, spp - s0)
                    state, aux = self._chunk_pass_block(
                        scene, state, aux, part, valid, key, lights_dev,
                        ns, jnp.int32(s0), geom,
                    )
            else:
                state, aux = self._chunk_pass(
                    scene, state, aux, part, valid, key, lights_dev, geom,
                )
        # Device scalars: Whitted specular-queue overflow drops + the
        # useful-ray count (0 for integrators without counters). Kept on
        # device — reading them mid-run would poison the relay dispatch
        # latency (§5b); tests and the opt-in stats path sync once per
        # render.
        self.last_queue_drops = aux["queue_drops"]
        self.last_useful_rays = aux["useful_rays"]
        if self.stats is not None:
            jax.block_until_ready(state.xyz)
            self.stats.stop("render")
            self.stats.add("specular_queue_drops", int(aux["queue_drops"]))
            self.stats.add("useful_rays", int(aux["useful_rays"]))
        return state
