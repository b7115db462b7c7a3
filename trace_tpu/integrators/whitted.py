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

import jax
import jax.numpy as jnp

from ..bxdf import bsdf as B
from ..bxdf import lobes as lb
from ..core import math as m
from ..core import spectrum as spec
from ..core.interaction import compute_differentials
from ..core.ray import RayDifferentials, SPAWN_EPS
from ..materials.materials import compute_scattering
from ..utils.pytree import replace
from . import common
from .base import SamplerIntegrator

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
        t_max=hit.time * 0.0 + jnp.inf,  # varying-axis-preserving full()
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
    queue = common.vary_like(
        dict(
            rd=rd,
            beta=jnp.ones((n, 3), F32),
            slot=jnp.arange(n, dtype=jnp.int32),
            active=jnp.ones((n,), bool),
        ),
        rd.o[..., 0],
    )

    def body(depth, carry):
        # depth is traced: one compiled body serves every level.
        l_buf, queue = carry
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

        # Specular children (sampler.jl:96-100); suppressed at max_depth.
        spawn = valid & (depth < max_depth)
        children = []
        for branch, flags in enumerate(
            (lb.BSDF_SPECULAR | lb.BSDF_REFLECTION,
             lb.BSDF_SPECULAR | lb.BSDF_TRANSMISSION)
        ):
            child_rd, factor, ok = _sample_specular(
                scene, hit, lobes, q_rd, spawn,
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
        return l_buf, queue

    l_buf0 = common.vary_like(jnp.zeros((n, 3), F32), rd.o[..., 0])
    l_buf, _ = jax.lax.fori_loop(1, max_depth + 1, body, (l_buf0, queue))
    return l_buf


class WhittedIntegrator(SamplerIntegrator):
    """Drop-in equivalent of the reference's WhittedIntegrator functor
    (sampler.jl:3-56); render loop inherited from SamplerIntegrator."""

    def li(self, scene, rd, key):
        return li(scene, rd, key, self.max_depth)
