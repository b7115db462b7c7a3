"""Multi-chip rendering over a JAX device mesh.

TPU-native counterpart of the reference's only parallelism strategy —
``Threads.@threads`` over film tiles with serial FilmTile merging
(/root/reference/src/integrators/sampler.jl:16-54). Here the megabatch of
film samples is sharded across the mesh's ``rays`` axis with ``shard_map``;
each device renders its lanes and accumulates into a device-local film,
and the films are combined with one ``psum`` over ICI — the deterministic
replacement for merge_film_tile! (SURVEY.md §2 parallelism table).

Works for every SAMPLER integrator: ``integrator="whitted"`` (default) or
``"path"`` (NEE + MIS — BASELINE config 2's tracer) — both radiance
functions share the megabatch signature. SPPM has its own SPMD passes
(parallel/sppm.py: camera, photon, and pair reductions sharded).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..film.film import FilmState
from ..integrators import common
from ..core.ray import scale_differentials
from ..sampler import uniform as U

F32 = jnp.float32


def make_mesh(devices=None, axis: str = "rays") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _li_fn(integrator: str):
    if integrator == "whitted":
        from ..integrators.whitted import li
        return li
    if integrator == "path":
        from ..integrators.path import li
        return li
    raise ValueError(f"unknown sampler integrator {integrator!r}")


@functools.lru_cache(maxsize=32)
def _sharded_step(scene, camera, mesh: Mesh, spp: int, max_depth: int,
                  axis: str, integrator: str):
    """Build (and cache) the jitted sharded render step. Cached per
    (scene-version, camera, mesh, config) so repeated renders — e.g.
    animation frames, which only change the light table — reuse the
    compiled executable. The light table enters as a traced argument
    (Scene.with_lights)."""
    film = camera.film
    li = _li_fn(integrator)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=P(),
    )
    def step(pix, lane_valid, key, lights):
        scn = scene.with_lights(lights)
        state = film.initial_state()
        for s in range(spp):
            # Identical derivation to SamplerIntegrator._sample_body:
            # per-sample fold, then pixel-identity lane keys — the
            # sharded render draws the EXACT single-chip sample streams.
            ks = U.lane_keys(
                jax.random.fold_in(key, s), U.pixel_ids(pix)
            )
            p_film, u_lens, u_time = U.get_camera_samples_lanes(
                U.fold_lanes(ks, 0), pix
            )
            rd, weight = camera.generate_ray_differentials(
                p_film, u_lens, u_time
            )
            rd = scale_differentials(
                rd, np.float32(1.0 / np.sqrt(spp))
            )
            l = common.sanitize_radiance(
                li(scn, rd, U.fold_lanes(ks, 1), max_depth)
            )
            state = film.add_samples(
                state, p_film,
                jnp.where(lane_valid[..., None], l, 0.0),
                jnp.where(lane_valid, weight, 0.0),
                valid=lane_valid,
            )
        return jax.tree.map(lambda x: jax.lax.psum(x, axis), state)

    return jax.jit(step)


def render_sharded(scene, camera, mesh: Mesh, spp: int = 1, max_depth: int = 5,
                   seed: int = 0, axis: str = "rays",
                   integrator: str = "whitted") -> FilmState:
    """Render the camera's full film, data-parallel over the mesh.

    Pixels are padded to a multiple of the mesh size and split evenly; the
    per-device partial films are psum-reduced. Sample streams are
    pixel-identity-keyed (sampler.uniform.lane_keys), so every device
    count — including 1 — draws the EXACT streams of the single-chip
    SamplerIntegrator render; only f32 film-accumulation order differs.
    ``integrator``: "whitted" or "path" (see module docstring).
    """
    film = camera.film
    (x0, y0), (x1, y1) = film.sample_bounds()
    xs = np.arange(x0, x1 + 1, dtype=np.int32)
    ys = np.arange(y0, y1 + 1, dtype=np.int32)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    pixels = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    n = pixels.shape[0]
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    pixels = np.concatenate([pixels, np.zeros((pad, 2), np.int32)])

    step = _sharded_step(scene, camera, mesh, spp, max_depth, axis,
                         integrator)
    key = jax.random.key(seed)
    lights = jax.tree.map(jnp.asarray, scene.lights)
    return step(jnp.asarray(pixels), jnp.asarray(valid), key, lights)
