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
from ..sampler.uniform import UniformSampler, get_camera_samples
from . import common

F32 = jnp.float32


class SamplerIntegrator:
    def __init__(self, camera, sampler: UniformSampler | None = None,
                 max_depth: int = 5, pixel_chunk: int = 1 << 16,
                 stats=None):
        self.camera = camera
        self.sampler = sampler or UniformSampler(1)
        self.max_depth = int(max_depth)
        self.pixel_chunk = int(pixel_chunk)
        self.stats = stats

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

    @functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2,))
    def _sample_pass(self, scene, state: FilmState, pixels, lane_valid, key,
                     stratum_lo, stratum_scale):
        """One sample per pixel for one chunk (jitted once per chunk shape;
        the spp loop stays outside so compile cost is O(1) in spp).
        stratum_lo/scale ([2] f32) confine the film jitter to a stratum —
        (0, 1) for the uniform sampler."""
        spp = self.sampler.samples_per_pixel
        p_film, u_lens, u_time = get_camera_samples(
            jax.random.fold_in(key, 0), pixels
        )
        p_film = pixels.astype(jnp.float32) + stratum_lo + (
            p_film - pixels.astype(jnp.float32)
        ) * stratum_scale
        rd, weight = self.camera.generate_ray_differentials(
            p_film, u_lens, u_time
        )
        rd = scale_differentials(rd, np.float32(1.0 / np.sqrt(spp)))
        l = self.li(scene, rd, jax.random.fold_in(key, 1))
        l = common.sanitize_radiance(l)
        return self.camera.film.add_samples(
            state, p_film,
            jnp.where(lane_valid[..., None], l, 0.0),
            jnp.where(lane_valid, weight, 0.0),
        )

    def render(self, scene) -> FilmState:
        from ..lights.lights import num_lights

        film = self.camera.film
        state = film.initial_state()
        pixels = self._pixel_grid()
        n = pixels.shape[0]
        chunk = min(self.pixel_chunk, n)
        spp = self.sampler.samples_per_pixel
        key = jax.random.key(self.sampler.seed)
        if self.stats is not None:
            self.stats.start("render")
            # Per wavefront level: one closest-hit + one shadow ray per
            # light for every queue lane.
            self.stats.add("camera_samples", n * spp)
            self.stats.add(
                "rays_traced",
                n * spp * self.max_depth * (1 + num_lights(scene.lights)),
            )
        for ci, start in enumerate(range(0, n, chunk)):
            part = pixels[start:start + chunk]
            valid = np.ones(part.shape[0], bool)
            if part.shape[0] < chunk:  # pad the tail to keep shapes static
                pad = chunk - part.shape[0]
                part = np.concatenate([part, np.zeros((pad, 2), np.int32)])
                valid = np.concatenate([valid, np.zeros(pad, bool)])
            part, valid = jnp.asarray(part), jnp.asarray(valid)
            k_chunk = jax.random.fold_in(key, ci)
            for s in range(spp):
                if hasattr(self.sampler, "stratum"):
                    sx, sy = self.sampler.stratum(s)
                    lo = np.array(
                        [sx / self.sampler.x_samples,
                         sy / self.sampler.y_samples], np.float32)
                    scale = np.array(
                        [1.0 / self.sampler.x_samples,
                         1.0 / self.sampler.y_samples], np.float32)
                else:
                    lo = np.zeros(2, np.float32)
                    scale = np.ones(2, np.float32)
                state = self._sample_pass(
                    scene, state, part, valid, jax.random.fold_in(k_chunk, s),
                    jnp.asarray(lo), jnp.asarray(scale),
                )
        if self.stats is not None:
            jax.block_until_ready(state.xyz)
            self.stats.stop("render")
        return state
