"""BSDF aggregate over fixed-width lobe tables.

TPU-native counterpart of /root/reference/src/materials/bsdf.jl. The
reference's BSDF holds up to 8 BxDF objects and loops/dispatches dynamically;
here a batch of shading points carries a ``Lobes`` SoA ([N, MAX_LOBES] slot
arrays, see :mod:`trace_tpu.bxdf.lobes`) plus the shading orthonormal frame,
and eval/sample/pdf are fully vectorized masked reductions over the slot
axis (bsdf.jl:79-201 semantics: uniform lobe pick, pdf averaging and f
summing across matching non-specular lobes).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import math as m
from ..utils.pytree import pytree
from . import lobes as lb

F32 = jnp.float32
L = lb.MAX_LOBES


@pytree
class Lobes:
    """[N, MAX_LOBES] SoA of BSDF lobes + per-point shading frame & eta.

    Frame fields mirror the reference BSDF ctor (bsdf.jl:41-51): ns from the
    shading normal, ss orthonormalized from ∂p∂u, ng the geometric normal.
    """

    kind: jnp.ndarray     # [N, L] int32
    c0: jnp.ndarray       # [N, L, 3]
    c1: jnp.ndarray       # [N, L, 3]
    eta_a: jnp.ndarray    # [N, L]
    eta_b: jnp.ndarray    # [N, L]
    a: jnp.ndarray        # [N, L]
    b: jnp.ndarray        # [N, L]
    fr_kind: jnp.ndarray  # [N, L] int32
    fr_eta: jnp.ndarray   # [N, L, 3]
    fr_k: jnp.ndarray     # [N, L, 3]
    ng: jnp.ndarray       # [N, 3] geometric normal
    ns: jnp.ndarray       # [N, 3] shading normal (frame z)
    ss: jnp.ndarray       # [N, 3] frame x
    ts: jnp.ndarray       # [N, 3] frame y
    eta: jnp.ndarray      # [N] relative IOR of the interface (bsdf.jl:36)


def empty_lobes(n, ng=None, ns=None, ss=None) -> Lobes:
    z = jnp.zeros((n, L), F32)
    z3 = jnp.zeros((n, L, 3), F32)
    zi = jnp.zeros((n, L), jnp.int32)
    zn = jnp.zeros((n, 3), F32)
    return Lobes(
        kind=zi, c0=z3, c1=z3, eta_a=z + 1.0, eta_b=z + 1.0, a=z, b=z,
        fr_kind=zi, fr_eta=z3, fr_k=z3,
        ng=zn if ng is None else ng,
        ns=zn if ns is None else ns,
        ss=zn if ss is None else ss,
        ts=zn if ss is None or ns is None else m.cross(ns, ss),
        eta=jnp.ones((n,), F32),
    )


def from_hit(hit) -> Lobes:
    """Empty lobe table with the shading frame of a SurfaceHit batch
    (bsdf.jl:41-51: ss = normalize(∂p∂u), ts = ns x ss)."""
    n = hit.t.shape[0]
    ss = m.normalize(hit.s_dpdu)
    return empty_lobes(n, ng=hit.n, ns=hit.ns, ss=ss)


def set_lobe(lobes: Lobes, slot: int, mask, **fields) -> Lobes:
    """Write lobe parameters into a slot for lanes where mask is True.
    fields: kind, c0, c1, eta_a, eta_b, a, b, fr_kind, fr_eta, fr_k
    (arrays broadcastable to [N] / [N, 3])."""
    upd = {}
    for name, val in fields.items():
        cur = getattr(lobes, name)
        val = jnp.asarray(val, cur.dtype)
        col = cur[:, slot]
        val = jnp.broadcast_to(val, col.shape)
        msk = mask[..., None] if col.ndim > mask.ndim else mask
        upd[name] = cur.at[:, slot].set(jnp.where(msk, val, col))
    import dataclasses

    return dataclasses.replace(lobes, **upd)


def _params(lobes: Lobes) -> lb.LobeParams:
    return lb.LobeParams(
        lobes.kind, lobes.c0, lobes.c1, lobes.eta_a, lobes.eta_b,
        lobes.a, lobes.b, lobes.fr_kind, lobes.fr_eta, lobes.fr_k,
    )


def _gather_params(lobes: Lobes, slot) -> lb.LobeParams:
    """Select one slot per lane (slot: [N] int32) — one-hot masked sums
    over the fixed 8-lobe axis instead of take_along_axis (a per-lane
    gather, 5-10x slower on TPU and fusion-blocking)."""
    n_slots = lobes.kind.shape[1]
    oh = slot[:, None] == jnp.arange(n_slots, dtype=jnp.int32)[None, :]
    g1 = lambda x: jnp.sum(jnp.where(oh, x, 0), axis=1).astype(x.dtype)
    g3 = lambda x: jnp.sum(
        jnp.where(oh[:, :, None], x, 0), axis=1
    ).astype(x.dtype)
    return lb.LobeParams(
        g1(lobes.kind), g3(lobes.c0), g3(lobes.c1), g1(lobes.eta_a),
        g1(lobes.eta_b), g1(lobes.a), g1(lobes.b), g1(lobes.fr_kind),
        g3(lobes.fr_eta), g3(lobes.fr_k),
    )


def world_to_local(lobes: Lobes, v):
    """(bsdf.jl:68-70)."""
    return jnp.stack(
        [m.dot(v, lobes.ss), m.dot(v, lobes.ts), m.dot(v, lobes.ns)], axis=-1
    )


def local_to_world(lobes: Lobes, v):
    """(bsdf.jl:72-74)."""
    return (
        v[..., 0:1] * lobes.ss + v[..., 1:2] * lobes.ts + v[..., 2:3] * lobes.ns
    )


def num_components(lobes: Lobes, flags=lb.BSDF_ALL):
    """(bsdf.jl:195-201)."""
    match = lb.matches_flags(lobes.kind, flags) & (lobes.kind != lb.NONE)
    return jnp.sum(match, axis=1).astype(jnp.int32)


def _matching(lobes: Lobes, flags):
    return lb.matches_flags(lobes.kind, flags) & (lobes.kind != lb.NONE)


def _refl_trans_mask(lobes: Lobes, wo_w, wi_w):
    """Per-slot geometric-side filter (bsdf.jl:88-98): when wi is on the
    reflection side of the *geometric* normal only REFLECTION lobes count,
    otherwise only TRANSMISSION lobes."""
    reflect = (m.dot(wi_w, lobes.ng) * m.dot(wo_w, lobes.ng)) > 0.0
    fl = lb.lobe_flags(lobes.kind)
    has_r = (fl & lb.BSDF_REFLECTION) != 0
    has_t = (fl & lb.BSDF_TRANSMISSION) != 0
    return jnp.where(reflect[:, None], has_r, has_t)


def f(lobes: Lobes, wo_w, wi_w, flags=lb.BSDF_ALL, mode=lb.RADIANCE):
    """Sum f over matching lobes (bsdf.jl:79-100) -> [N, 3]."""
    wo = world_to_local(lobes, wo_w)
    wi = world_to_local(lobes, wi_w)
    degenerate = jnp.abs(wo[..., 2]) < 1e-12

    match = _matching(lobes, flags) & _refl_trans_mask(lobes, wo_w, wi_w)
    f_all = lb.f(_params(lobes), wo[:, None, :], wi[:, None, :], mode)
    total = jnp.sum(jnp.where(match[..., None], f_all, 0.0), axis=1)
    return jnp.where(degenerate[..., None], 0.0, total)


def compute_pdf(lobes: Lobes, wo_w, wi_w, flags=lb.BSDF_ALL):
    """Average pdf over matching lobes (bsdf.jl:177-193) -> [N]."""
    wo = world_to_local(lobes, wo_w)
    wi = world_to_local(lobes, wi_w)
    match = _matching(lobes, flags)
    pdf_all = lb.pdf(_params(lobes), wo[:, None, :], wi[:, None, :])
    total = jnp.sum(jnp.where(match, pdf_all, 0.0), axis=1)
    count = jnp.sum(match, axis=1)
    pdf = jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)
    return jnp.where(jnp.abs(wo[..., 2]) < 1e-12, 0.0, pdf)


class BSDFSample(NamedTuple):
    wi: jnp.ndarray             # [N, 3] world space
    f: jnp.ndarray              # [N, 3]
    pdf: jnp.ndarray            # [N]
    sampled_flags: jnp.ndarray  # [N] int32; 0 when sampling failed


def sample_f(
    lobes: Lobes, wo_w, u, flags=lb.BSDF_ALL, mode=lb.RADIANCE
) -> BSDFSample:
    """Sample one lobe per lane, uniform among matching slots, with the
    reference's pdf-averaging / f-summing across matching non-specular
    lobes (bsdf.jl:107-175).

    u: [N, 2] — u[:,0] picks the lobe and is remapped (bsdf.jl:119) as the
    chosen lobe's first 2D-sample coordinate; u[:,1] is the second
    (PBRT BSDF::Sample_f's 2D u).
    """
    n = wo_w.shape[0]
    match = _matching(lobes, flags)                        # [N, L]
    count = jnp.sum(match, axis=1).astype(jnp.int32)       # [N]
    any_match = count > 0

    comp = jnp.minimum(
        jnp.floor(u[:, 0] * count.astype(F32)).astype(jnp.int32),
        jnp.maximum(count - 1, 0),
    )
    # Slot of the comp-th matching lobe.
    order = jnp.cumsum(match.astype(jnp.int32), axis=1) - 1  # rank among matches
    is_chosen = match & (order == comp[:, None])
    slot = jnp.argmax(is_chosen, axis=1).astype(jnp.int32)

    # Remap u[:,0] (bsdf.jl:119: stretch within the chosen stratum).
    u0 = jnp.minimum(
        u[:, 0] * count.astype(F32) - comp.astype(F32), 1.0 - 1e-6
    )
    u_lobe = jnp.stack([u0, u[:, 1]], axis=-1)

    wo = world_to_local(lobes, wo_w)
    degenerate = jnp.abs(wo[..., 2]) < 1e-12

    chosen = _gather_params(lobes, slot)
    ls = lb.sample(chosen, wo, u_lobe, mode)
    wi = ls.wi
    wi_w = local_to_world(lobes, wi)

    specular = (ls.sampled_flags & lb.BSDF_SPECULAR) != 0
    multi = count > 1

    # pdf across other matching lobes (only for non-specular picks).
    pdf_all = lb.pdf(_params(lobes), wo[:, None, :], wi[:, None, :])
    others = match & ~is_chosen
    pdf_others = jnp.sum(jnp.where(others, pdf_all, 0.0), axis=1)
    pdf = ls.pdf + jnp.where(~specular & multi, pdf_others, 0.0)
    pdf = jnp.where(multi, pdf / jnp.maximum(count, 1), pdf)

    # f across all matching lobes on the correct geometric side.
    side = _refl_trans_mask(lobes, wo_w, wi_w)
    f_all = lb.f(_params(lobes), wo[:, None, :], wi[:, None, :], mode)
    f_sum = jnp.sum(jnp.where((match & side)[..., None], f_all, 0.0), axis=1)
    f_out = jnp.where(specular[..., None], ls.f, f_sum)

    ok = any_match & ~degenerate & (pdf > 0.0)
    return BSDFSample(
        wi=wi_w,
        f=jnp.where(ok[..., None], f_out, 0.0),
        pdf=jnp.where(ok, pdf, 0.0),
        sampled_flags=jnp.where(ok, ls.sampled_flags, 0),
    )
