"""Whitted integrator as a wavefront over ray megabatches.

TPU-native counterpart of /root/reference/src/integrators/sampler.jl. The
reference recurses per ray (li -> specular_reflect/transmit -> li,
sampler.jl:58-199) under a threaded tile loop; here each depth level is one
vectorized pass over a fixed-capacity ray queue, and the two specular
children per hit are compacted (sort by liveness) back into the queue — the
recursion tree becomes an iterative wavefront with stream compaction
(SURVEY.md §7 "Recursion -> iteration").
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
from ..core.interaction import compute_differentials
from ..core.ray import RayDifferentials, SPAWN_EPS, scale_differentials
from ..film.film import FilmState
from ..materials.materials import compute_scattering
from ..sampler.uniform import UniformSampler, get_camera_samples
from ..utils.pytree import replace
from . import common

F32 = jnp.float32


def _sample_specular(scene, hit, lobes, rd, valid, key, flags):
    """One specular branch (sampler.jl:103-199): sample_f restricted to
    SPECULAR|REFLECTION or |TRANSMISSION, child beta factor, spawned child
    ray with propagated differentials."""
    n = hit.t.shape[0]
    u = jax.random.uniform(key, (n, 3), F32)
    bs = B.sample_f(lobes, hit.wo, u, flags)
    cos_i = m.dot(bs.wi, hit.ns)
    ok = (
        valid
        & (bs.pdf > 0)
        & ~spec.is_black(bs.f)
        & (jnp.abs(cos_i) > 1e-9)
    )
    factor = bs.f * (jnp.abs(cos_i) / jnp.maximum(bs.pdf, 1e-20))[..., None]

    if flags & lb.BSDF_REFLECTION:
        rx_o, ry_o, rx_d, ry_d = common.reflect_differentials(rd, hit, bs.wi)
    else:
        rx_o, ry_o, rx_d, ry_d = common.transmit_differentials(
            rd, hit, lobes, bs.wi
        )
    child = RayDifferentials(
        o=hit.p + SPAWN_EPS * bs.wi,
        d=bs.wi,
        t_max=jnp.full((n,), jnp.inf, F32),
        time=hit.time,
        has_differentials=rd.has_differentials & ok,
        rx_origin=rx_o, ry_origin=ry_o,
        rx_direction=rx_d, ry_direction=ry_d,
    )
    return child, factor, ok


def _compact(queue, capacity):
    """Keep the ``capacity`` most-alive entries (stable, deterministic)."""
    order = jnp.argsort(~queue["active"], stable=True)[:capacity]
    return jax.tree.map(lambda x: x[order], queue)


def li(scene, rd: RayDifferentials, key, max_depth: int = 5):
    """Radiance for a megabatch of camera rays (sampler.jl:58-101).

    Returns [N, 3]. The specular recursion is flattened into a depth loop
    over a queue of capacity N; overflow children (more than N live lanes
    after a branching level) are dropped deterministically.
    """
    n = rd.o.shape[0]
    l_buf = jnp.zeros((n, 3), F32)
    queue = dict(
        rd=rd,
        beta=jnp.ones((n, 3), F32),
        slot=jnp.arange(n, dtype=jnp.int32),
        active=jnp.ones((n,), bool),
    )

    for depth in range(1, max_depth + 1):
        k_depth = jax.random.fold_in(key, depth)
        q_rd = queue["rd"]
        hit = scene.intersect(q_rd.o, q_rd.d, q_rd.t_max, q_rd.time)
        valid = queue["active"] & hit.valid
        hit = replace(hit, valid=valid)
        hit = compute_differentials(hit, q_rd)

        lobes = compute_scattering(
            scene.materials, hit, allow_multiple_lobes=False, mode=lb.RADIANCE
        )

        # Emitted + direct (le is only non-zero for our area lights).
        contrib = scene.area_light_radiance(hit, hit.wo)
        contrib = contrib + common.sum_over_lights(
            scene, hit, lobes, jax.random.fold_in(k_depth, 0)
        )
        contrib = common.sanitize_radiance(queue["beta"] * contrib)
        l_buf = l_buf.at[queue["slot"]].add(
            jnp.where(valid[..., None], contrib, 0.0)
        )

        if depth == max_depth:
            break

        # Specular children (sampler.jl:96-100).
        children = []
        for branch, flags in enumerate(
            (lb.BSDF_SPECULAR | lb.BSDF_REFLECTION,
             lb.BSDF_SPECULAR | lb.BSDF_TRANSMISSION)
        ):
            child_rd, factor, ok = _sample_specular(
                scene, hit, lobes, q_rd, valid,
                jax.random.fold_in(k_depth, branch + 1), flags,
            )
            children.append(dict(
                rd=child_rd,
                beta=jnp.where(ok[..., None], queue["beta"] * factor, 0.0),
                slot=queue["slot"],
                active=ok,
            ))
        queue = _compact(
            jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *children),
            n,
        )

    return l_buf


class WhittedIntegrator:
    """Drop-in equivalent of the reference's WhittedIntegrator functor
    (sampler.jl:3-56): render loop over the film sample bounds, spp samples
    per pixel, deterministic filter-footprint accumulation into the film."""

    def __init__(self, camera, sampler: UniformSampler | None = None,
                 max_depth: int = 5, pixel_chunk: int = 1 << 16):
        self.camera = camera
        self.sampler = sampler or UniformSampler(1)
        self.max_depth = int(max_depth)
        self.pixel_chunk = int(pixel_chunk)

    def __call__(self, scene, save: bool = True):
        state = self.render(scene)
        if save:
            self.camera.film.save_png(state)
        return state

    # -- rendering ----------------------------------------------------------

    def _pixel_grid(self):
        film = self.camera.film
        (x0, y0), (x1, y1) = film.sample_bounds()
        xs = np.arange(x0, x1 + 1, dtype=np.int32)
        ys = np.arange(y0, y1 + 1, dtype=np.int32)
        gx, gy = np.meshgrid(xs, ys, indexing="xy")
        return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)

    @functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2,))
    def _sample_pass(self, scene, state: FilmState, pixels, lane_valid, key):
        """One sample per pixel for one chunk (jitted once per chunk shape;
        the spp loop stays outside so compile cost is O(1) in spp)."""
        spp = self.sampler.samples_per_pixel
        p_film, u_lens, u_time = get_camera_samples(
            jax.random.fold_in(key, 0), pixels
        )
        rd, weight = self.camera.generate_ray_differentials(
            p_film, u_lens, u_time
        )
        rd = scale_differentials(rd, np.float32(1.0 / np.sqrt(spp)))
        l = li(scene, rd, jax.random.fold_in(key, 1), self.max_depth)
        l = common.sanitize_radiance(l)
        return self.camera.film.add_samples(
            state, p_film,
            jnp.where(lane_valid[..., None], l, 0.0),
            jnp.where(lane_valid, weight, 0.0),
        )

    def render(self, scene) -> FilmState:
        film = self.camera.film
        state = film.initial_state()
        pixels = self._pixel_grid()
        n = pixels.shape[0]
        chunk = min(self.pixel_chunk, n)
        spp = self.sampler.samples_per_pixel
        key = jax.random.key(self.sampler.seed)
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
                state = self._sample_pass(
                    scene, state, part, valid, jax.random.fold_in(k_chunk, s)
                )
        return state
