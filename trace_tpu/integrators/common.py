"""Shared integrator machinery: direct lighting, specular ray-differential
propagation, radiance accumulation guards.

TPU-native counterpart of the per-ray helpers in
/root/reference/src/integrators/sampler.jl (li's light loop :85-94,
specular_reflect/transmit :103-199) and sppm.jl's
uniform_sample_one_light/estimate_direct (:503-562) — all vectorized over
ray megabatches.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..bxdf import bsdf as B
from ..bxdf import lobes as lb
from ..core import math as m
from ..core import spectrum as spec
from ..core.ray import RayDifferentials
from ..lights import lights as light_mod
from ..sampler import uniform as U

F32 = jnp.float32


def offset_ray_origin(p, d, n_geom):
    """Scale-aware spawn offset for occlusion-type rays: SPAWN_EPS along
    the direction plus a |p|-proportional nudge along the geometric
    normal, signed toward the ray side (the pattern scene.unoccluded
    uses for shadow rays; direction-only offsets self-occlude ~0.4% of
    on-surface f32 points)."""
    from ..core.ray import SPAWN_EPS

    o = p + SPAWN_EPS * d
    scale = 1e-4 * jnp.maximum(1.0, jnp.max(jnp.abs(p), axis=-1, keepdims=True))
    side = jnp.sign(jnp.sum(n_geom * d, axis=-1, keepdims=True))
    return o + n_geom * (scale * side)


def sum_over_lights(scene, hit, lobes, key, flags=lb.BSDF_ALL & ~lb.BSDF_SPECULAR):
    """Whitted's direct-lighting loop (sampler.jl:85-94): for every light,
    sample_li, evaluate the BSDF, shadow-test, accumulate
    f * Li * |wi.ns| / pdf. Returns [N, 3].

    ``key``: a per-lane key array (identity-keyed, sampler.uniform
    lane_keys) or a scalar key (positional fallback for direct calls)."""
    n = hit.t.shape[0]
    total = jnp.zeros((n, 3), F32)
    n_lights = light_mod.num_lights(scene.lights)
    keys = U.ensure_lane_keys(key, n)
    for li_idx in range(n_lights):
        u = U.uniform_lanes(U.fold_lanes(keys, li_idx), 2)
        idx = jnp.full((n,), li_idx, jnp.int32)
        radiance, wi, pdf, p_light = light_mod.sample_li(
            scene.lights, idx, hit.p, u,
            tris=scene.triangles, max_area_tris=scene.max_area_tris,
        )
        f_val = B.f(lobes, hit.wo, wi, flags)
        contrib_possible = ~spec.is_black(radiance) & (pdf > 0) & ~spec.is_black(f_val)
        vis = scene.unoccluded(
            hit.p, p_light, n_geom=hit.n
        ) & contrib_possible & hit.valid
        contrib = f_val * radiance * (
            jnp.abs(m.dot(wi, hit.ns)) / jnp.maximum(pdf, 1e-20)
        )[..., None]
        total = total + jnp.where(vis[..., None], contrib, 0.0)
    return total


def estimate_direct(scene, hit, lobes, light_idx, u_light, u_scatter,
                    flags=lb.BSDF_ALL & ~lb.BSDF_SPECULAR):
    """One-light direct estimate with multiple importance sampling.

    Light-sampling leg mirrors the reference's estimate_direct
    (sppm.jl:519-553); the BSDF-sampling leg (left unimplemented there,
    sppm.jl:551-553) is completed here with the power heuristic
    (sppm.jl:556-562) for area lights. Returns [N, 3].
    """
    n = hit.t.shape[0]
    # --- light-sampling leg -------------------------------------------------
    radiance, wi, light_pdf, p_light = light_mod.sample_li(
        scene.lights, light_idx, hit.p, u_light,
        tris=scene.triangles, max_area_tris=scene.max_area_tris,
    )
    f_val = B.f(lobes, hit.wo, wi, flags) * jnp.abs(
        m.dot(wi, hit.ns)
    )[..., None]
    scatter_pdf = B.compute_pdf(lobes, hit.wo, wi, flags)
    ok = (light_pdf > 0) & ~spec.is_black(radiance) & ~spec.is_black(f_val) & hit.valid
    vis = scene.unoccluded(hit.p, p_light, n_geom=hit.n) & ok
    delta = jnp.asarray(light_mod.is_delta(scene.lights))[light_idx]
    w_l = jnp.where(
        delta, 1.0, m.power_heuristic(1.0, light_pdf, 1.0, scatter_pdf)
    )
    ld = jnp.where(
        vis[..., None],
        f_val * radiance * (w_l / jnp.maximum(light_pdf, 1e-20))[..., None],
        0.0,
    )

    # --- BSDF-sampling leg (area + infinite lights) --------------------------
    if scene.max_area_tris > 0 or light_mod.has_env(scene.lights):
        bs = B.sample_f(lobes, hit.wo, u_scatter, flags)
        spec_sample = (bs.sampled_flags & lb.BSDF_SPECULAR) != 0
        f_b = bs.f * jnp.abs(m.dot(bs.wi, hit.ns))[..., None]
        go = hit.valid & ~delta & (bs.pdf > 0) & ~spec.is_black(f_b)
        # Trace toward the light; does it hit one of this light's
        # triangles? Same scale-aware normal nudge as scene.unoccluded's
        # shadow rays: a direction-only offset leaves ~0.4% of on-surface
        # points deterministically self-occluded at f32, silently dropping
        # this MIS leg (energy loss in glossy highlights).
        o = offset_ray_origin(hit.p, bs.wi, hit.n)
        hit2 = scene.intersect(o, bs.wi, jnp.full((n,), jnp.inf, F32))
        cos_l = m.dot(hit2.n, -bs.wi)
        # pdf_li dispatches on the picked light's kind: solid-angle area
        # pdf for AREA lanes, the env-map texel pdf for INFINITE lanes.
        li_pdf = light_mod.pdf_li(
            scene.lights, light_idx, hit.p, bs.wi, hit2.t,
            jnp.abs(cos_l), scene.triangles,
        )
        counts = jnp.zeros((n,), bool)
        le = jnp.zeros((n, 3), F32)
        if scene.max_area_tris > 0:
            tri_idx = jnp.clip(hit2.prim_id - scene.n_spheres, 0,
                               max(scene.n_triangles - 1, 0))
            # Only FLAT triangles can be area lights; instanced prim ids
            # start at n_spheres + n_triangles (scene.py id layout) and
            # must not clip onto the last flat triangle's light id.
            is_flat_tri = (hit2.prim_id >= scene.n_spheres) & (
                hit2.prim_id < scene.n_spheres + scene.n_triangles
            )
            hits_light = (
                hit2.valid
                & is_flat_tri
                & (jnp.asarray(scene.tri_light_id)[tri_idx] == light_idx)
            )
            le_a = light_mod.le_area(scene.lights, light_idx, hit2.n, -bs.wi)
            le = le + jnp.where(hits_light[..., None], le_a, 0.0)
            counts = counts | hits_light
        if light_mod.has_env(scene.lights):
            # Escaped BSDF rays see the environment when the picked light
            # is the INFINITE entry (le_inf is 0 on other lanes).
            escaped = ~hit2.valid
            le_e = light_mod.le_inf(scene.lights, light_idx, bs.wi)
            le = le + jnp.where(escaped[..., None], le_e, 0.0)
            counts = counts | (escaped & ~spec.is_black(le_e))
        w_b = jnp.where(spec_sample, 1.0,
                        m.power_heuristic(1.0, bs.pdf, 1.0, li_pdf))
        lb_leg = jnp.where(
            (go & counts)[..., None],
            f_b * le * (w_b / jnp.maximum(bs.pdf, 1e-20))[..., None],
            0.0,
        )
        ld = ld + lb_leg
    return ld


def uniform_sample_one_light(scene, hit, lobes, key, light_cdf=None):
    """Pick one light (uniform or by power CDF) and estimate_direct,
    divided by the pick pmf (sppm.jl:503-517)."""
    n = hit.t.shape[0]
    n_lights = light_mod.num_lights(scene.lights)
    if n_lights == 0:
        return jnp.zeros((n, 3), F32)
    row = U.uniform_lanes(U.ensure_lane_keys(key, n), 5)
    u_pick = row[:, 0]
    if light_cdf is None:
        idx = jnp.minimum((u_pick * n_lights).astype(jnp.int32), n_lights - 1)
        pmf = jnp.full((n,), 1.0 / n_lights, F32)
    else:
        idx = jnp.sum((light_cdf[None, :] < u_pick[:, None]).astype(jnp.int32), axis=1)
        idx = jnp.minimum(idx, n_lights - 1)
        prev = jnp.concatenate([jnp.zeros(1, F32), light_cdf[:-1]])
        pmf = (light_cdf - prev)[idx]
    u_light = row[:, 1:3]
    u_scatter = row[:, 3:5]
    ld = estimate_direct(scene, hit, lobes, idx, u_light, u_scatter)
    return ld / jnp.maximum(pmf, 1e-12)[..., None]


def light_power_cdf(scene):
    """Power-weighted light distribution (sppm.jl:564-569) -> CDF [L]."""
    p = spec.to_y(light_mod.power(scene.lights))
    total = jnp.maximum(jnp.sum(p), 1e-20)
    return jnp.cumsum(p / total)


# ---------------------------------------------------------------------------
# Specular ray-differential propagation (sampler.jl:103-199)
# ---------------------------------------------------------------------------


def _dndxy(hit):
    dndx = hit.s_dndu * hit.dudx[..., None] + hit.s_dndv * hit.dvdx[..., None]
    dndy = hit.s_dndu * hit.dudy[..., None] + hit.s_dndv * hit.dvdy[..., None]
    return dndx, dndy


def reflect_differentials(rd: RayDifferentials, hit, wi) -> tuple:
    """Reflected-ray differentials (sampler.jl:120-141). Returns
    (rx_o, ry_o, rx_d, ry_d)."""
    ns = hit.ns
    wo = hit.wo
    dndx, dndy = _dndxy(hit)
    rx_o = hit.p + hit.dpdx
    ry_o = hit.p + hit.dpdy
    dwodx = -rd.rx_direction - wo
    dwody = -rd.ry_direction - wo
    ddndx = m.dot(dwodx, ns) + m.dot(wo, dndx)
    ddndy = m.dot(dwody, ns) + m.dot(wo, dndy)
    won = m.dot(wo, ns)
    rx_d = (
        wi - dwodx
        + 2.0 * (won[..., None] * dndx + ddndx[..., None] * ns)
    )
    ry_d = (
        wi - dwody
        + 2.0 * (won[..., None] * dndy + ddndy[..., None] * ns)
    )
    return rx_o, ry_o, rx_d, ry_d


def transmit_differentials(rd: RayDifferentials, hit, lobes, wi) -> tuple:
    """Transmitted-ray differentials (sampler.jl:160-199, PBRT-errata form).

    lobes.eta is the INTERIOR IOR (like bsdf.η): the relative IOR is
    1/eta when entering (wo on the normal side) and eta when exiting,
    with ns and its derivatives negated so wo·ns > 0. Verified against
    finite-differenced refract() directions. The reference's exit branch
    is dead code — its condition is ``(ns ⋅ ns) < 0`` (sampler.jl:181),
    never true — a latent bug fixed here like ray.jl's ry_direction
    (no reference scene textures glass, so it is image-invisible there).
    """
    wo = hit.wo
    ns = hit.ns
    dndx, dndy = _dndxy(hit)
    exiting = m.dot(wo, ns) < 0
    ns = jnp.where(exiting[..., None], -ns, ns)
    dndx = jnp.where(exiting[..., None], -dndx, dndx)
    dndy = jnp.where(exiting[..., None], -dndy, dndy)
    eta_int = jnp.maximum(lobes.eta, 1e-6)
    eta = jnp.where(exiting, eta_int, 1.0 / eta_int)

    rx_o = hit.p + hit.dpdx
    ry_o = hit.p + hit.dpdy
    dwodx = -rd.rx_direction - wo
    dwody = -rd.ry_direction - wo
    ddndx = m.dot(dwodx, ns) + m.dot(wo, dndx)
    ddndy = m.dot(dwody, ns) + m.dot(wo, dndy)
    won = m.dot(wo, ns)
    win = jnp.maximum(jnp.abs(m.dot(wi, ns)), 1e-9)
    mu = eta * won - win
    nu = eta - eta * eta * won / win
    dmudx = nu * ddndx
    dmudy = nu * ddndy
    rx_d = wi - eta[..., None] * dwodx + (
        mu[..., None] * dndx + dmudx[..., None] * ns
    )
    ry_d = wi - eta[..., None] * dwody + (
        mu[..., None] * dndy + dmudy[..., None] * ns
    )
    return rx_o, ry_o, rx_d, ry_d


@functools.partial(jax.jit, static_argnums=(2,))
def _transform_and_build(tris, xf, leaf: int):
    """ONE dispatch for a whole animation-frame geometry update: apply the
    frame Transform (vertices through the matrix, normals through the
    inverse transpose) and Morton-cluster the result, all device-side.
    Unfused, the same work is ~20 separate relay dispatches (each jnp op
    in transform_triangles is its own ~0.4-1 ms round-trip through the
    remote-TPU tunnel), which dominated bench config 5's frame time."""
    from ..accel.morton import build_clusters_device
    from ..shapes.triangle import transform_triangles

    tris_f = transform_triangles(tris, xf)
    return tris_f, build_clusters_device(tris_f, leaf)


def prepare_geometry(scene, geometry, transform=None, accel=None):
    """Device-build traversal tables for per-frame animated geometry.

    ``geometry`` is a Triangles pytree (device or host arrays) with the
    scene's topology but moved vertices/normals. Returns a traced
    ``(Triangles, ClusterAccel)`` pair for apply_geometry, built fully on
    device (accel/morton.py Morton clustering) so a frame costs one
    ~ms-scale rebuild instead of a host SAH refit. None passes through —
    the static-scene path stays untouched.

    ``transform`` (optional): a core.transform.Transform applied to
    ``geometry`` on device, fused with the cluster build into a single
    dispatch (Transform is a (m, inv_m) pytree, so per-frame motion is a
    traced argument — no retrace, no per-op dispatch storm). This is the
    fast path for rigid per-frame motion: keep the base mesh resident and
    pass only the frame's Transform."""
    if geometry is None:
        if transform is not None:
            raise ValueError("geometry_transform requires geometry")
        return None
    from ..accel.morton import build_clusters_device
    from ..shapes.triangle import num_triangles

    assert num_triangles(geometry) == scene.n_triangles, \
        "animated geometry must keep the scene's topology"
    tris_dev = jax.tree.map(jnp.asarray, geometry)
    if accel is not None:
        # Pre-built accelerator threaded in as TRACED arguments alongside
        # the triangles. This is how huge static scenes dodge the
        # jit-embedded-constant route: a >10M-tri table embedded in the
        # program is a ~GB compile payload, which the remote-compile
        # relay rejects (broken pipe); as traced args the program stays
        # small and the tables ride h2d. Accepts a ClusterAccel (XLA
        # cluster sweep), a PallasSweepAccelerator or its SweepTables
        # (Pallas sparse sweep — the fast path at this scale).
        if transform is not None:
            raise ValueError("geometry_transform requires a device rebuild"
                             " — omit accel")
        from ..ops.sweep_pallas import PallasSweepAccelerator
        if isinstance(accel, PallasSweepAccelerator):
            accel = accel.tables
        return (tris_dev, jax.tree.map(jnp.asarray, accel))
    leaf = 32 if scene.n_triangles < 300_000 else 64
    if transform is not None:
        return _transform_and_build(tris_dev, transform, leaf)
    return (tris_dev, build_clusters_device(tris_dev, leaf))


def apply_geometry(scene, geom):
    """Inside a jitted pass: swap a prepare_geometry pair into a scene
    view (Scene.with_geometry). The pair arrives as a TRACED argument, so
    every animation frame reuses the compiled executable — the geometry
    analog of scene.with_lights(lights)."""
    if geom is None:
        return scene
    from ..accel.clusters import ClusterAccelerator
    from ..ops.sweep_pallas import PallasSweepAccelerator, SweepTables

    tris, acc = geom
    if isinstance(acc, SweepTables):
        # Traced Pallas sweep tables (huge static scenes): wrap without
        # any host packing. Knobs are static scene attributes; 128-ray
        # blocks keep the [B, GL] determinant grids inside ~16 MB VMEM
        # at GL=4096 (the >10M-tri shape).
        sweep = PallasSweepAccelerator.from_tables(
            acc,
            block_rays=getattr(scene, "anim_block_rays", None) or 128,
            ray_chunk=getattr(scene, "anim_ray_chunk", None) or 8192,
            interpret=jax.default_backend() != "tpu",
            certified=bool(getattr(scene, "exact_edges", False)),
        )
        return scene.with_geometry(tris, sweep)
    # Stage width follows SceneBuilder.build's measured big-scene tuning
    # (leaf 64 / stage 128 from ~200k tris: 107 vs 72 Mrays/s at 1M on
    # v5e); tri count is static under jit (cluster table shape). Scenes
    # may pin the knobs (anim_stage_clusters / anim_ray_chunk attributes,
    # static ints) — the >10M-tri traced-table path needs a small
    # ray_chunk to keep the [rays, supers] entry table in HBM.
    n_tris = acc.tri_id.shape[0] * acc.leaf_tris
    stage = (getattr(scene, "anim_stage_clusters", None)
             or (128 if n_tris >= 200_000 else 64))
    ray_chunk = getattr(scene, "anim_ray_chunk", None) or 16384
    return scene.with_geometry(
        tris, ClusterAccelerator(acc, stage_clusters=stage,
                                 ray_chunk=ray_chunk))


def sanitize_radiance(l):
    """NaN/negative-radiance guard (sampler.jl:41-49)."""
    l = jnp.where(jnp.isfinite(l), l, 0.0)
    return jnp.maximum(l, 0.0)


def vary_like(tree, src):
    """Tag every leaf of `tree` with the varying manual axes of `src`.

    Under shard_map, lax loop carries must have consistent varying-axis
    types; constants (zeros/ones/arange) built inside the shard are
    unvarying while loop outputs become varying. Mixing src (a sharded
    per-lane f32 array, e.g. rd.o[..., 0]) into each leaf with a no-op
    arithmetic makes the initial carry varying without needing the mesh
    axis name. Outside shard_map this is a compile-time no-op.
    """
    z = src * 0.0  # varying zeros [n]

    def fix(x):
        zz = jnp.reshape(z, z.shape + (1,) * (x.ndim - z.ndim))
        if x.dtype == jnp.bool_:
            return x ^ (zz != 0.0)
        return x + zz.astype(x.dtype)

    return jax.tree.map(fix, tree)
