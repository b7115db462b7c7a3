"""Planar SPPM photon pass (emit + walk + splat records).

Twin of SPPMIntegrator._photon_walk_body (reference sppm.jl:334-436) in
the planar component layout. Halton QMC indexing, the splat-record
layout ([D-1, C, ...] buffers the pair pass consumes), the
searchsorted cell-range lookup and the constant-beta Russian-roulette
quirk (sppm.jl:430 commented out) all match the packed body exactly;
only the walk's interior arithmetic runs on flat [N] components.
Single-light or all-delta scenes only (per wavefront/path.supports);
env-lit scenes keep the packed body.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..bxdf import lobes as lb
from ..core import vec as V
from ..core.ray import SPAWN_EPS
from ..core.vec import V3
from ..sampler.halton import radical_inverse
from . import lights as WL
from . import materials as WM
from . import path as WP
from . import shade as S
from . import whitted as WW

F32 = jnp.float32


def supports(scene) -> bool:
    return WP.supports(scene)


def photon_walk_body(integ, scene, halton_idx, lane_valid,
                     light_cdf, light_pmf,
                     grid_lo, grid_res, grid_inv_extent, sorted_cells):
    """Planar _photon_walk_body; identical outputs (splat record dict of
    [S=(D-1)*C] arrays)."""
    from ..integrators.sppm import _hash_cells

    c = halton_idx.shape[0]
    ri = lambda dim: radical_inverse(dim, halton_idx)

    u_light = ri(0)
    n_lights = light_cdf.shape[0]
    light_num = jnp.minimum(
        jnp.sum((light_cdf < u_light[:, None]).astype(jnp.int32), axis=1),
        n_lights - 1,
    )
    light_pdf = light_pmf[light_num]

    time = (np.float32(integ.camera.shutter_open) * (1.0 - ri(5))
            + np.float32(integ.camera.shutter_close) * ri(5))
    # Static unroll over light indices (n_lights small by supports()).
    le = o = d = n_l = None
    pdf_pos = pdf_dir = None
    for j in range(WL.light_count(scene)):
        le_j, o_j, d_j, nl_j, pp_j, pd_j = WL.sample_le_static(
            scene, j, ri(1), ri(2), ri(3), ri(4), time)
        sel = light_num == j
        if le is None:
            le, o, d, n_l = le_j, o_j, d_j, nl_j
            pdf_pos, pdf_dir = pp_j, pd_j
        else:
            le = V.where(sel, le_j, le)
            o = V.where(sel, o_j, o)
            d = V.where(sel, d_j, d)
            n_l = V.where(sel, nl_j, n_l)
            pdf_pos = jnp.where(sel, pp_j, pdf_pos)
            pdf_dir = jnp.where(sel, pd_j, pdf_dir)

    beta = le * (jnp.abs(n_l.dot(d))
                 / jnp.maximum(light_pdf * pdf_pos * pdf_dir, 1e-20))
    active = (lane_valid & (pdf_pos > 0) & (pdf_dir > 0) & (light_pdf > 0)
              & ~le.is_black() & ~beta.is_black())
    beta_y0 = jnp.maximum(WP.to_y(beta), 1e-20)

    n_splat_levels = integ.max_depth - 1
    zf = beta_y0 * 0.0
    splats = dict(
        p=jnp.zeros((n_splat_levels, c, 3), F32) + zf[None, :, None],
        d=jnp.zeros((n_splat_levels, c, 3), F32) + zf[None, :, None],
        beta=jnp.zeros((n_splat_levels, c, 3), F32) + zf[None, :, None],
        start=(jnp.zeros((n_splat_levels, c), jnp.int32)
               + zf[None, :].astype(jnp.int32)),
        count=(jnp.zeros((n_splat_levels, c), jnp.int32)
               + zf[None, :].astype(jnp.int32)),
    )

    glo = jnp.asarray(grid_lo)
    gres = jnp.asarray(grid_res)
    ginv = jnp.asarray(grid_inv_extent)

    def body(depth, carry):
        o, d, time, beta, active, splats = carry
        hit = WW.closest_hit(scene, o, d, jnp.full((c,), jnp.inf, F32),
                             time)
        live = active & hit.valid

        # Grid coords componentwise (sppm._to_grid twin).
        gx = jnp.floor(gres[0].astype(F32) * ((hit.p.x - glo[0]) * ginv[0])
                       ).astype(jnp.int32)
        gy = jnp.floor(gres[1].astype(F32) * ((hit.p.y - glo[1]) * ginv[1])
                       ).astype(jnp.int32)
        gz = jnp.floor(gres[2].astype(F32) * ((hit.p.z - glo[2]) * ginv[2])
                       ).astype(jnp.int32)
        in_bounds = ((gx >= 0) & (gx < gres[0]) & (gy >= 0)
                     & (gy < gres[1]) & (gz >= 0) & (gz < gres[2]))
        gx = jnp.clip(gx, 0, gres[0] - 1)
        gy = jnp.clip(gy, 0, gres[1] - 1)
        gz = jnp.clip(gz, 0, gres[2] - 1)
        cell = _hash_cells(gx, gy, gz, integ.n_pixels)
        start = jnp.searchsorted(sorted_cells, cell,
                                 side="left").astype(jnp.int32)
        end = jnp.searchsorted(sorted_cells, cell,
                               side="right").astype(jnp.int32)
        ok = live & in_bounds & (depth > 1)
        slot = jnp.maximum(depth - 2, 0)
        hp = hit.p.arr()
        dp = d.arr()
        bp = beta.arr()

        def upd(buf, val):
            return buf.at[slot].set(
                jnp.where(ok.reshape((c,) + (1,) * (val.ndim - 1)), val,
                          buf[slot]))

        splats = dict(
            p=upd(splats["p"], hp),
            d=upd(splats["d"], dp),
            beta=upd(splats["beta"], bp),
            start=upd(splats["start"], start),
            count=upd(splats["count"], jnp.where(ok, end - start, 0)),
        )

        hit = hit._replace(valid=live)
        lobes = WM.compute_scattering(
            scene.materials, hit, allow_multiple_lobes=True,
            mode=lb.IMPORTANCE)
        dim = 6 + 3 * (depth - 1)
        bs = S.sample_f(lobes, -d, ri(dim), ri(dim + 1), lb.BSDF_ALL,
                        mode=lb.IMPORTANCE)
        ok2 = live & (bs.pdf > 0) & ~bs.f.is_black()
        beta_new = beta * bs.f * (jnp.abs(bs.wi.dot(hit.ns))
                                  / jnp.maximum(bs.pdf, 1e-20))
        # RR vs the INITIAL beta; beta itself never updated
        # (sppm.jl:421-430 — the commented-out update, replicated).
        q = jnp.maximum(0.0, 1.0 - WP.to_y(beta_new) / beta_y0)
        u_rr = ri(dim + 2)
        active = ok2 & (u_rr >= q)
        o = V.where(active, hit.p + bs.wi * SPAWN_EPS, o)
        d = V.where(active, bs.wi, d)
        time = jnp.where(active, hit.time, time)
        return (o, d, time, beta, active, splats)

    # Halton ``ri`` dims depend on the traced depth only through
    # radical_inverse(dim, ...) with dim = 6 + 3*(depth-1); the packed
    # body runs the same fori_loop so dims stay traced-compatible.
    # Varying-axis tagging (shard_map): the static-light emission
    # broadcasts light params as shard-replicated constants; tag every
    # [c]-leaf of the carry with the varying zero (splat buffers are
    # already tagged at construction).
    zb = zf != 0.0

    def _vary(x):
        if x.dtype == jnp.bool_:
            return x ^ zb
        return x + zf.astype(x.dtype)

    head = jax.tree.map(_vary, (o, d, time + zf, beta, active))
    carry = head + (splats,)
    carry = jax.lax.fori_loop(1, integ.max_depth + 1, body, carry)
    splats = carry[-1]
    return {k: v.reshape((-1,) + v.shape[2:]) for k, v in splats.items()}
