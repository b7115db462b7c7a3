"""Multi-chip SPPM: photon- and pair-level data parallelism over a mesh.

SURVEY.md §7 step 9 ("per-chip photon index ranges"): the reference's
photon pass is already schedule-independent because every sample dimension
is keyed on the global photon index (sppm.jl:328-339), so sharding photons
across chips is exact — each chip walks its Halton index range, and the
photon -> visible-point pair reduction becomes per-chip partial (phi, M)
accumulators combined with one psum over ICI (the deterministic
multi-chip replacement for the reference's atomics).

The scene, grid and visible points are replicated (they are read-only
within an iteration, matching the reference's shared-memory reads).

The jitted shard_map bodies are cached per (integrator, scene, mesh,
axis) — pair_pass_sharded runs once per super_chunk per iteration and the
other two once per iteration, so a fresh ``jax.jit(closure)`` each call
would re-trace and recompile every time (the same pitfall
render.py:_sharded_step solves with lru_cache; Scene.__hash__ is
version-aware, so mutations re-trace correctly).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


F32 = jnp.float32


@functools.lru_cache(maxsize=64)
def _photon_walk_jit(integ, scene, mesh: Mesh, axis: str):
    def body(idx, valid, cdf, pmf, lo, res, inv_ext, cells):
        return integ._photon_walk_body(
            scene, idx, valid, cdf, pmf, lo, res, inv_ext, cells
        )

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P(), P(), P(), P()),
        out_specs=P(axis),
    ))


def photon_walk_sharded(integ, scene, mesh: Mesh, axis: str,
                        halton_idx, lane_valid, light_cdf, light_pmf,
                        grid_lo, grid_res, grid_inv_extent, sorted_cells):
    """Shard the photon walk over `axis`; returns the global splat dict
    (sharded along photons)."""
    return _photon_walk_jit(integ, scene, mesh, axis)(
        halton_idx, lane_valid, light_cdf, light_pmf,
        grid_lo, grid_res, grid_inv_extent, sorted_cells,
    )


@functools.lru_cache(maxsize=64)
def _pair_jit(integ, mesh: Mesh, axis: str, n_local: int):
    n_pixels = integ.n_pixels

    def body(pair_base_arr, total_a, offsets_a, p_a, d_a, b_a, s_a,
             vp_a, radius_a, sv_a):
        base = pair_base_arr[0]
        phi_l = jnp.zeros((n_pixels, 3), F32)
        m_l = jnp.zeros((n_pixels,), jnp.int32)
        phi_l, m_l = integ._pair_body(
            phi_l, m_l, base, total_a, offsets_a,
            p_a, d_a, b_a, s_a, vp_a, radius_a, sv_a, n_local,
        )
        return (
            jax.lax.psum(phi_l, axis),
            jax.lax.psum(m_l, axis),
        )

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
    ))


def pair_pass_sharded(integ, mesh: Mesh, axis: str,
                      phi, m_cnt, total, offsets,
                      sp_p, sp_d, sp_beta, sp_start,
                      vp, radius, sorted_vp,
                      super_chunk: int, bases):
    """One sharded pair sweep: pair indices split over `axis` (one base
    per device, integ.pair_chunk pairs each), per-chip partial (phi, M)
    psum-reduced then added into the running accumulators."""
    n_local = super_chunk // mesh.devices.size
    dphi, dm = _pair_jit(integ, mesh, axis, n_local)(
        bases, total, offsets, sp_p, sp_d, sp_beta, sp_start,
        vp, radius, sorted_vp,
    )
    return phi + dphi, m_cnt + dm


@functools.lru_cache(maxsize=64)
def _camera_pass_jit(integ, scene, mesh: Mesh, axis: str):
    def body(pix, valid, key):
        # No device fold: _camera_pass_body keys every draw off the
        # pixel identity, so the sharded pass is BIT-EXACT vs one chip.
        ld, vp = integ._camera_pass_body(scene, pix, valid, key)
        return ld, vp

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis)),
    ))


def camera_pass_sharded(integ, scene, mesh: Mesh, axis: str,
                        pixels, lane_valid, it_key):
    """Shard the SPPM camera pass over the mesh pixel axis. Pixel-
    identity-keyed streams make it bit-exact vs the single-device
    pass."""
    return _camera_pass_jit(integ, scene, mesh, axis)(
        pixels, lane_valid, it_key)
