"""Light sources as one packed SoA table.

TPU-native counterpart of /root/reference/src/lights/ (light.jl, point.jl,
spot.jl, directional.jl). All lights of a scene live in one ``Lights``
pytree; ``sample_li``/``sample_le`` take a per-lane light index and dispatch
on the packed kind code with masked selects, so the SPPM photon pass can
gather its CDF-picked light entirely on device.

Beyond the reference's delta lights, a diffuse area light over a triangle
range is provided (the reference asserts non-delta lights away,
sppm.jl:541); it powers the path tracer's MIS.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.pytree import pytree, replace
from ..core import math as m
from ..shapes import triangle as tri_mod

F32 = jnp.float32

POINT = 0
SPOT = 1
DISTANT = 2
AREA = 3
INFINITE = 4

# Flags (reference light.jl:1-10).
DELTA_POSITION = 1
DELTA_DIRECTION = 2
LIGHT_AREA = 4
LIGHT_INFINITE = 8


@pytree
class Lights:
    kind: jnp.ndarray            # [L] int32
    flags: jnp.ndarray           # [L] int32
    p: jnp.ndarray               # [L, 3] world position
    i: jnp.ndarray               # [L, 3] intensity / radiance
    direction: jnp.ndarray       # [L, 3] (distant)
    w2l: jnp.ndarray             # [L, 4, 4]
    l2w: jnp.ndarray             # [L, 4, 4]
    cos_total_width: jnp.ndarray    # [L] spot
    cos_falloff_start: jnp.ndarray  # [L] spot
    tri_start: jnp.ndarray       # [L] int32 area-light triangle range
    tri_count: jnp.ndarray       # [L] int32
    total_area: jnp.ndarray      # [L]
    two_sided: jnp.ndarray       # [L] bool
    world_center: jnp.ndarray    # [3] scene bounding sphere (preprocess)
    world_radius: jnp.ndarray    # [] scalar
    # Environment (INFINITE) light tables — one per scene, global rather
    # than per-entry (an equal-rect image doesn't pack into scalar SoA
    # columns). Scenes without one carry 1-texel dummies.
    env_rgb: jnp.ndarray         # [K, 3] flat equal-rect radiance texels
    env_pmf: jnp.ndarray         # [K] texel pick pmf (sin-theta-weighted)
    env_prob: jnp.ndarray        # [K] alias-table acceptance probability
    env_alias: jnp.ndarray       # [K] int32 alias-table partner cell
    env_h: jnp.ndarray           # [] int32 image height
    env_w: jnp.ndarray           # [] int32 image width


def num_lights(l: Lights) -> int:
    return l.kind.shape[0]


def has_env(l: Lights) -> bool:
    """Whether the scene carries an environment light. Shape-based (the
    dummy tables are 1-texel; pack_lights gives real envs >= 2), so it is
    safe on TRACED lights pytrees — reading kind values would not be."""
    return l.env_pmf.shape[0] > 1


def is_delta(l: Lights):
    return (l.flags & (DELTA_POSITION | DELTA_DIRECTION)) != 0


def point_light(light_to_world, intensity):
    """(reference point.jl:19-25)."""
    return dict(kind=POINT, l2w=light_to_world, i=intensity)


def spot_light(light_to_world, intensity, total_width_deg, falloff_start_deg):
    """(reference spot.jl:9-22)."""
    return dict(
        kind=SPOT, l2w=light_to_world, i=intensity,
        cos_total_width=float(np.cos(np.deg2rad(total_width_deg))),
        cos_falloff_start=float(np.cos(np.deg2rad(falloff_start_deg))),
    )


def distant_light(light_to_world, radiance, direction):
    """(reference directional.jl:24-35)."""
    return dict(kind=DISTANT, l2w=light_to_world, i=radiance,
                direction=direction)


def area_light(radiance, tri_start, tri_count, two_sided=False):
    """Diffuse area light over triangles [tri_start, tri_start+tri_count)
    of the scene's packed Triangles SoA."""
    return dict(kind=AREA, i=radiance, tri_start=int(tri_start),
                tri_count=int(tri_count), two_sided=bool(two_sided))


def infinite_light(l2w=None, radiance=(1.0, 1.0, 1.0), image=None):
    """Image-based environment light (beyond the reference, which has no
    infinite lights; PBRT InfiniteAreaLight). ``image``: [H, W, 3] linear
    equal-rect radiance map (rows = theta from the light frame's +z, cols
    = phi), or None for a constant sky; ``radiance`` scales either. At
    most one per scene."""
    img = None if image is None else np.asarray(image, np.float32)
    return dict(kind=INFINITE, l2w=l2w, i=radiance, image=img)


_KIND_FLAGS = {POINT: DELTA_POSITION, SPOT: DELTA_POSITION,
               DISTANT: DELTA_DIRECTION, AREA: LIGHT_AREA,
               INFINITE: LIGHT_INFINITE}


def _alias_table(pmf: np.ndarray):
    """Vose alias table over a pmf -> (prob [K] f32, alias [K] i32).
    Sampling is then two O(1) gathers per draw — no per-lane searchsorted
    (which would materialize an [N, K] compare on TPU)."""
    k = pmf.size
    scaled = (pmf * k).astype(np.float64)
    prob = np.ones(k, np.float64)
    alias = np.arange(k, dtype=np.int64)
    small = [i for i in range(k) if scaled[i] < 1.0]
    large = [i for i in range(k) if scaled[i] >= 1.0]
    while small and large:
        s, l = small.pop(), large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] -= 1.0 - scaled[s]
        (small if scaled[l] < 1.0 else large).append(l)
    return prob.astype(np.float32), alias.astype(np.int32)


def pack_lights(entries, tris: tri_mod.Triangles | None = None) -> Lights:
    """Build the Lights SoA from light dicts (see the ctor helpers above)."""
    n = len(entries)
    ident = np.eye(4, dtype=np.float32)
    kind = np.zeros(n, np.int32)
    flags = np.zeros(n, np.int32)
    p = np.zeros((n, 3), np.float32)
    i = np.zeros((n, 3), np.float32)
    direction = np.zeros((n, 3), np.float32)
    direction[:, 2] = 1.0
    w2l = np.tile(ident, (n, 1, 1))
    l2w = np.tile(ident, (n, 1, 1))
    ctw = np.zeros(n, np.float32)
    cfs = np.zeros(n, np.float32)
    tri_start = np.zeros(n, np.int32)
    tri_count = np.zeros(n, np.int32)
    total_area = np.zeros(n, np.float32)
    two_sided = np.zeros(n, bool)
    # Dummy 1-texel env tables; replaced by an INFINITE entry below.
    env_rgb = np.zeros((1, 3), np.float32)
    env_pmf = np.ones(1, np.float32)
    env_prob = np.ones(1, np.float32)
    env_alias = np.zeros(1, np.int32)
    env_h = env_w = 1

    tri_areas = None
    # Per-triangle areas are only consumed by area lights; skip the
    # all-triangle cross products (~0.27 s at 1M tris) otherwise.
    if (tris is not None and tri_mod.num_triangles(tris) > 0
            and any(e["kind"] == AREA for e in entries)):
        tri_areas = tri_mod.areas_np(tris)

    for j, e in enumerate(entries):
        kind[j] = e["kind"]
        flags[j] = _KIND_FLAGS[e["kind"]]
        i[j] = np.asarray(e["i"], np.float32)
        t = e.get("l2w")
        if t is not None:
            l2w[j] = np.asarray(t.m, np.float32)
            w2l[j] = np.asarray(t.inv_m, np.float32)
        p[j] = l2w[j][:3, 3]
        if e["kind"] == SPOT:
            ctw[j] = e["cos_total_width"]
            cfs[j] = e["cos_falloff_start"]
        if e["kind"] == DISTANT:
            d = np.asarray(e["direction"], np.float32)
            dw = l2w[j][:3, :3] @ d
            direction[j] = dw / np.linalg.norm(dw)
        if e["kind"] == AREA:
            tri_start[j] = e["tri_start"]
            tri_count[j] = e["tri_count"]
            two_sided[j] = e["two_sided"]
            assert tri_areas is not None, "area light requires scene triangles"
            total_area[j] = tri_areas[
                e["tri_start"] : e["tri_start"] + e["tri_count"]
            ].sum()
        if e["kind"] == INFINITE:
            assert env_h == 1 and env_rgb.sum() == 0.0, (
                "at most one infinite light per scene"
            )
            img = e.get("image")
            if img is None:
                img = np.ones((1, 1, 3), np.float32)
            img = img * np.asarray(e["i"], np.float32)  # scale folded in
            if img.shape[0] * img.shape[1] < 2:
                # >= 2 texels so has_env() can gate on shape alone
                # (trace-safe); duplicated columns are semantics-neutral.
                img = np.tile(img, (1, 2, 1))
            env_h, env_w = int(img.shape[0]), int(img.shape[1])
            env_rgb = img.reshape(-1, 3).astype(np.float32)
            # i holds the image's mean radiance (feeds `power`).
            i[j] = env_rgb.mean(axis=0)
            # sin-theta-weighted luminance pmf over texels; uniform
            # fallback for an all-black image keeps pdfs finite.
            lum = env_rgb @ np.array(
                [0.212671, 0.715160, 0.072169], np.float32
            )
            sin_t = np.sin(
                np.pi * (np.arange(env_h, dtype=np.float64) + 0.5) / env_h
            ).astype(np.float32)
            wgt = (lum.reshape(env_h, env_w)
                   * sin_t[:, None]).reshape(-1).astype(np.float64)
            total = wgt.sum()
            pmf = (wgt / total if total > 0
                   else np.full(wgt.size, 1.0 / wgt.size))
            env_pmf = pmf.astype(np.float32)
            env_prob, env_alias = _alias_table(pmf)

    # Numpy leaves until Scene finalization (see triangle.pack_triangle_mesh).
    return Lights(
        kind, flags, p, i,
        direction, w2l, l2w,
        ctw, cfs,
        tri_start, tri_count,
        total_area, two_sided,
        np.zeros(3, np.float32), np.asarray(0.0, np.float32),
        env_rgb, env_pmf, env_prob, env_alias,
        np.asarray(env_h, np.int32), np.asarray(env_w, np.int32),
    )


def preprocess(lights: Lights, world_center, world_radius) -> Lights:
    """Scene-bound preprocessing the reference forgets to call
    (directional.jl:35-37, Trace.jl:184 TODO) — we always do."""
    return replace(
        lights,
        world_center=np.asarray(world_center, np.float32),
        world_radius=np.asarray(world_radius, np.float32),
    )


def _gather(lights: Lights, idx):
    import jax

    lights = jax.tree.map(jnp.asarray, lights)  # np leaves -> gathers
    g = lambda x: x[idx]
    return {f: g(getattr(lights, f)) for f in (
        "kind", "flags", "p", "i", "direction", "w2l", "l2w",
        "cos_total_width", "cos_falloff_start",
        "tri_start", "tri_count", "total_area", "two_sided",
    )}


def falloff(g, w):
    """Spot falloff delta^4 (reference spot.jl:33-42). g: gathered fields."""
    wl = m.mat3_apply(g["w2l"][:, :3, :3], w)  # exact f32, not MXU bf16
    cos_t = m.normalize(wl)[..., 2]
    d = (cos_t - g["cos_total_width"]) / jnp.maximum(
        g["cos_falloff_start"] - g["cos_total_width"], 1e-12
    )
    f = jnp.clip(d, 0.0, 1.0) ** 4
    f = jnp.where(cos_t < g["cos_total_width"], 0.0, f)
    return jnp.where(cos_t >= g["cos_falloff_start"], 1.0, f)


# ---------------------------------------------------------------------------
# Environment (INFINITE) light machinery — beyond-reference, PBRT
# InfiniteAreaLight semantics on the SoA light table. The emitter is
# piecewise-constant per texel (radiance lookup and pick pmf use the SAME
# texel value), so light-sampling, BSDF-sampling MIS and photon emission
# are mutually consistent without a blurred distribution.
# ---------------------------------------------------------------------------


def _env_uv_cell(lights, wl):
    """Light-space unit direction -> (sin_theta [N], cell [N] i32)."""
    ct = jnp.clip(wl[..., 2], -1.0, 1.0)
    theta = jnp.arccos(ct)
    phi = jnp.arctan2(wl[..., 1], wl[..., 0])
    phi = jnp.where(phi < 0, phi + 2.0 * m.PI, phi)
    h = lights.env_h.astype(F32)
    w = lights.env_w.astype(F32)
    x = jnp.clip(jnp.floor(phi * (0.5 / m.PI) * w), 0.0, w - 1.0)
    y = jnp.clip(jnp.floor(theta * (1.0 / m.PI) * h), 0.0, h - 1.0)
    return jnp.sin(theta), (y * w + x).astype(jnp.int32)


def _env_pdf(lights, cell, sin_theta):
    """Solid-angle pdf of the env sampler at a texel: p(u,v) / (2 pi^2
    sin theta) with p(u,v) = pmf * H * W (PBRT eq. 14.10)."""
    hw = (lights.env_h * lights.env_w).astype(F32)
    p = lights.env_pmf[cell] * hw / (
        2.0 * m.PI * m.PI * jnp.maximum(sin_theta, 1e-9)
    )
    return jnp.where(sin_theta > 1e-9, p, 0.0)


def _env_sample_cell(lights, u0):
    """One uniform -> (cell [N] i32, fresh uniform [N]) via the alias
    table (two gathers; the alias coin is recycled into a fresh uniform
    by conditional rescale)."""
    k = lights.env_pmf.shape[0]
    x = u0 * k
    c = jnp.clip(jnp.floor(x), 0.0, k - 1.0).astype(jnp.int32)
    f = x - c.astype(F32)
    p_c = lights.env_prob[c]
    take_alias = f >= p_c
    cell = jnp.where(take_alias, lights.env_alias[c], c)
    f2 = jnp.where(
        take_alias,
        (f - p_c) / jnp.maximum(1.0 - p_c, 1e-9),
        f / jnp.maximum(p_c, 1e-9),
    )
    return cell, jnp.clip(f2, 0.0, 1.0 - 1e-7)


def _env_sample_dir(lights, g_l2w, u):
    """Importance-sample a world direction toward the environment.
    Returns (wi [N,3] world, radiance [N,3], pdf [N] solid angle)."""
    cell, fu = _env_sample_cell(lights, u[:, 0])
    w = lights.env_w.astype(F32)
    h = lights.env_h.astype(F32)
    row = jnp.floor(cell.astype(F32) / w)
    col = cell.astype(F32) - row * w
    phi = 2.0 * m.PI * (col + fu) / w
    theta = m.PI * (row + u[:, 1]) / h
    st, ct = jnp.sin(theta), jnp.cos(theta)
    wl = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)
    wi = m.normalize(m.mat3_apply(g_l2w[:, :3, :3], wl))
    return wi, lights.env_rgb[cell], _env_pdf(lights, cell, st)


def env_le(lights, d):
    """Escaped-ray environment radiance [N, 3] (callers gate on the
    scene's host-side has_env flag; identically 0 without an env light)."""
    import jax

    lights = jax.tree.map(jnp.asarray, lights)
    is_inf = lights.kind == INFINITE
    rot = jnp.sum(
        jnp.where(is_inf[:, None, None], lights.w2l, 0.0), axis=0
    )[:3, :3]
    wl = m.normalize(m.mat3_apply(rot, m.normalize(d)))
    st, cell = _env_uv_cell(lights, wl)
    le = lights.env_rgb[cell]
    return jnp.where(jnp.any(is_inf), le, jnp.zeros_like(le))


def le_inf(lights, idx, wi):
    """Per-lane env radiance along wi for lanes whose light ``idx`` is the
    INFINITE entry; 0 elsewhere (the BSDF-sampling MIS leg's Le)."""
    import jax

    lights = jax.tree.map(jnp.asarray, lights)
    g_kind = lights.kind[idx]
    g_w2l = lights.w2l[idx]
    wl = m.normalize(m.mat3_apply(g_w2l[:, :3, :3], wi))
    _, cell = _env_uv_cell(lights, wl)
    return jnp.where(
        (g_kind == INFINITE)[:, None], lights.env_rgb[cell], 0.0
    )


def _sample_area_point(g, tris: tri_mod.Triangles, u, max_tris: int):
    """Uniform-by-area point on the light's triangle range. Builds the area
    CDF on the fly over a static ``max_tris`` window."""
    import jax

    tris = jax.tree.map(jnp.asarray, tris)  # np leaves -> gathers
    offs = jnp.arange(max_tris, dtype=jnp.int32)[None, :]          # [1, M]
    tids = jnp.clip(g["tri_start"][:, None] + offs, 0,
                    max(tri_mod.num_triangles(tris) - 1, 0))
    in_range = offs < g["tri_count"][:, None]
    a = tri_mod.areas(tris)[tids] * in_range                        # [N, M]
    cdf = jnp.cumsum(a, axis=1)
    total = jnp.maximum(cdf[:, -1:], 1e-20)
    pick = jnp.sum((cdf / total < u[:, 0:1]).astype(jnp.int32), axis=1)
    pick = jnp.clip(pick, 0, max_tris - 1)
    # One-hot selects over the window (take_along_axis = per-lane gather,
    # 5-10x slower on TPU).
    ohp = pick[:, None] == offs
    sel = lambda x: jnp.sum(jnp.where(ohp, x, 0), axis=1).astype(x.dtype)
    tid = sel(tids)

    # Rescale u0 within the chosen triangle's stratum for a fresh sample.
    lo = sel(jnp.concatenate(
        [jnp.zeros_like(cdf[:, :1]), cdf[:, :-1]], axis=1) / total)
    hi = sel(cdf / total)
    u0 = jnp.clip((u[:, 0] - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)

    b = m.uniform_sample_triangle(jnp.stack([u0, u[:, 1]], axis=-1))
    v0, v1, v2 = tris.v0[tid], tris.v1[tid], tris.v2[tid]
    p_l = (1.0 - b[:, 0:1] - b[:, 1:2]) * v0 + b[:, 0:1] * v1 + b[:, 1:2] * v2
    n_l = m.normalize(m.cross(v1 - v0, v2 - v0))
    flip = tris.flip_normal[tid]
    n_l = jnp.where(flip[:, None], -n_l, n_l)
    return p_l, n_l


def sample_li(lights: Lights, idx, p_ref, u, tris=None, max_area_tris: int = 0):
    """Batched sample_li: radiance toward p_ref from light `idx` per lane.

    Returns (radiance [N,3], wi [N,3], pdf [N], p_light [N,3]). The caller
    spawns the shadow ray p_ref -> p_light (reference VisibilityTester).
    """
    g = _gather(lights, idx)
    n = p_ref.shape[0]
    kind = g["kind"]

    # Point / spot share geometry (point.jl:50-57, spot.jl:24-31).
    to_l = g["p"] - p_ref
    dist2 = jnp.maximum(m.length_squared(to_l), 1e-20)
    wi_pos = to_l / jnp.sqrt(dist2)[..., None]
    rad_point = g["i"] / dist2[..., None]
    rad_spot = rad_point * falloff(g, -wi_pos)[..., None]

    # Distant (directional.jl:39-47).
    out_p = p_ref + g["direction"] * (2.0 * lights.world_radius)

    wi = jnp.where((kind == DISTANT)[:, None], g["direction"], wi_pos)
    p_light = jnp.where((kind == DISTANT)[:, None], out_p, jnp.broadcast_to(g["p"], (n, 3)))
    radiance = jnp.where((kind == SPOT)[:, None], rad_spot, rad_point)
    radiance = jnp.where((kind == DISTANT)[:, None], g["i"], radiance)
    pdf = jnp.ones(n, F32)

    if has_env(lights):
        import jax

        lt = jax.tree.map(jnp.asarray, lights)
        wi_e, rad_e, pdf_e = _env_sample_dir(lt, g["l2w"], u)
        p_e = p_ref + wi_e * (2.0 * lt.world_radius)
        is_inf = kind == INFINITE
        wi = jnp.where(is_inf[:, None], wi_e, wi)
        p_light = jnp.where(is_inf[:, None], p_e, p_light)
        radiance = jnp.where(is_inf[:, None], rad_e, radiance)
        pdf = jnp.where(is_inf, pdf_e, pdf)

    if max_area_tris > 0 and tris is not None:
        p_a, n_a = _sample_area_point(g, tris, u, max_area_tris)
        to_a = p_a - p_ref
        d2_a = jnp.maximum(m.length_squared(to_a), 1e-20)
        wi_a = to_a / jnp.sqrt(d2_a)[..., None]
        cos_l = m.dot(n_a, -wi_a)
        emits = jnp.where(g["two_sided"], jnp.abs(cos_l) > 1e-9, cos_l > 1e-9)
        # Area pdf -> solid-angle pdf.
        pdf_a = d2_a / jnp.maximum(
            jnp.abs(cos_l) * jnp.maximum(g["total_area"], 1e-20), 1e-20
        )
        rad_a = jnp.where(emits[:, None], g["i"], 0.0)
        is_area = kind == AREA
        wi = jnp.where(is_area[:, None], wi_a, wi)
        p_light = jnp.where(is_area[:, None], p_a, p_light)
        radiance = jnp.where(is_area[:, None], rad_a, radiance)
        pdf = jnp.where(is_area, pdf_a, pdf)

    return radiance, wi, pdf, p_light


def pdf_li(lights: Lights, idx, p_ref, wi, hit_t, hit_cos, tris=None):
    """Solid-angle pdf that light `idx` generates direction wi from p_ref —
    the MIS BSDF-leg the reference leaves unimplemented (sppm.jl:551-553).
    hit_t/hit_cos: distance and |cos| at the light-surface hit (0 -> miss).
    Delta lights return 0."""
    g = _gather(lights, idx)
    d2 = hit_t * hit_t * m.length_squared(wi)
    pdf_a = d2 / jnp.maximum(hit_cos * jnp.maximum(g["total_area"], 1e-20), 1e-20)
    pdf = jnp.where((g["kind"] == AREA) & (hit_cos > 1e-9), pdf_a, 0.0)
    if has_env(lights):
        import jax

        lt = jax.tree.map(jnp.asarray, lights)
        wl = m.normalize(m.mat3_apply(g["w2l"][:, :3, :3], m.normalize(wi)))
        st, cell = _env_uv_cell(lt, wl)
        pdf = jnp.where(
            g["kind"] == INFINITE, _env_pdf(lt, cell, st), pdf
        )
    return pdf


def sample_le(lights: Lights, idx, u1, u2, time, tris=None, max_area_tris: int = 0):
    """Batched photon emission (point.jl:61-69, spot.jl:44-55).

    Returns (Le [N,3], o [N,3], d [N,3], n_light [N,3], pdf_pos [N],
    pdf_dir [N]).
    """
    g = _gather(lights, idx)
    n = u1.shape[0]
    kind = g["kind"]

    # Point: uniform sphere.
    d_point = m.uniform_sample_sphere(u1)

    # Spot: uniform cone in light space -> world.
    d_cone = m.uniform_sample_cone(u1, g["cos_total_width"])
    d_spot = m.normalize(
        m.mat3_apply(g["l2w"][:, :3, :3], d_cone)
    )

    d = jnp.where((kind == SPOT)[:, None], d_spot, d_point)
    o = jnp.broadcast_to(g["p"], (n, 3))
    le = jnp.where(
        (kind == SPOT)[:, None], g["i"] * falloff(g, d_spot)[..., None], g["i"]
    )
    pdf_pos = jnp.ones(n, F32)
    pdf_dir = jnp.where(
        kind == SPOT,
        m.uniform_cone_pdf(g["cos_total_width"]),
        m.uniform_sphere_pdf(),
    )

    # Distant: disk of scene-bounding-sphere radius (PBRT; the reference
    # has no directional sample_le — directional.jl stops at sample_li).
    # ``direction`` points TOWARD the light (sample_li convention), so
    # photons start on the light side of the scene and travel along
    # -direction: Ray(pDisk + wr*wLight, -wLight).
    wc, wr = lights.world_center, lights.world_radius
    _, v1, v2 = m.coordinate_system(g["direction"])
    cd = m.concentric_sample_disk(u1)
    p_disk = (
        wc
        + wr * (cd[:, 0:1] * v1 + cd[:, 1:2] * v2)
        + wr * g["direction"]
    )
    is_dist = kind == DISTANT
    o = jnp.where(is_dist[:, None], p_disk, o)
    d = jnp.where(is_dist[:, None], -g["direction"], d)
    pdf_pos = jnp.where(
        is_dist, 1.0 / jnp.maximum(m.PI * wr * wr, 1e-20), pdf_pos
    )
    pdf_dir = jnp.where(is_dist, 1.0, pdf_dir)

    n_light = d
    if has_env(lights):
        # Env photons: importance-sample a direction TOWARD the light
        # (sample_li convention), emit from a world-radius disk on that
        # side traveling back through the scene (PBRT InfiniteAreaLight
        # Sample_Le, same shape as the DISTANT case above).
        import jax

        lt = jax.tree.map(jnp.asarray, lights)
        w_toward, rad_e, pdf_e = _env_sample_dir(lt, g["l2w"], u1)
        _, ev1, ev2 = m.coordinate_system(w_toward)
        cd_e = m.concentric_sample_disk(u2)
        p_disk_e = (
            wc
            + wr * (cd_e[:, 0:1] * ev1 + cd_e[:, 1:2] * ev2)
            + wr * w_toward
        )
        is_inf = kind == INFINITE
        o = jnp.where(is_inf[:, None], p_disk_e, o)
        d = jnp.where(is_inf[:, None], -w_toward, d)
        n_light = jnp.where(is_inf[:, None], -w_toward, n_light)
        le = jnp.where(is_inf[:, None], rad_e, le)
        pdf_pos = jnp.where(
            is_inf, 1.0 / jnp.maximum(m.PI * wr * wr, 1e-20), pdf_pos
        )
        pdf_dir = jnp.where(is_inf, pdf_e, pdf_dir)
    if max_area_tris > 0 and tris is not None:
        p_a, n_a = _sample_area_point(g, tris, u1, max_area_tris)
        # Two-sided lights emit from both faces (PBRT DiffuseAreaLight
        # Sample_Le): remap u2.x to pick the hemisphere, halving pdf_dir —
        # matching sample_li / le_area / power, which all honor two_sided.
        two = g["two_sided"]
        back = two & (u2[:, 0] < 0.5)
        u2x = jnp.where(
            two,
            jnp.minimum(
                jnp.where(back, u2[:, 0] * 2.0, (u2[:, 0] - 0.5) * 2.0),
                1.0 - 1e-7,
            ),
            u2[:, 0],
        )
        w_local = m.cosine_sample_hemisphere(
            jnp.stack([u2x, u2[:, 1]], axis=-1)
        )
        wz = jnp.where(back, -w_local[:, 2], w_local[:, 2])
        _, t1, t2 = m.coordinate_system(n_a)
        d_a = w_local[:, 0:1] * t1 + w_local[:, 1:2] * t2 + wz[:, None] * n_a
        is_area = kind == AREA
        o = jnp.where(is_area[:, None], p_a, o)
        d = jnp.where(is_area[:, None], d_a, d)
        n_light = jnp.where(is_area[:, None], n_a, n_light)
        pdf_pos = jnp.where(
            is_area, 1.0 / jnp.maximum(g["total_area"], 1e-20), pdf_pos
        )
        pdf_dir = jnp.where(
            is_area,
            jnp.abs(wz) * m.INV_PI * jnp.where(two, 0.5, 1.0),
            pdf_dir,
        )
        le = jnp.where(is_area[:, None], g["i"], le)

    return le, o, d, n_light, pdf_pos, pdf_dir


def power(lights: Lights):
    """Per-light total power [L, 3] (point.jl:74-76, spot.jl:44-46,
    directional.jl:53-55; area: L * A * pi [* 2 if two-sided])."""
    p_point = 4.0 * m.PI * lights.i
    p_spot = lights.i * (
        2.0 * m.PI
        * (1.0 - 0.5 * (lights.cos_falloff_start + lights.cos_total_width))
    )[..., None]
    p_dist = lights.i * (m.PI * lights.world_radius**2)
    p_area = lights.i * (
        lights.total_area * m.PI * jnp.where(lights.two_sided, 2.0, 1.0)
    )[..., None]
    out = jnp.where((lights.kind == SPOT)[:, None], p_spot, p_point)
    # INFINITE power = pi * wr^2 * mean radiance (PBRT InfiniteAreaLight;
    # pack_lights stores the image mean in `i`) — same form as DISTANT.
    is_far = (lights.kind == DISTANT) | (lights.kind == INFINITE)
    out = jnp.where(is_far[:, None], p_dist, out)
    return jnp.where((lights.kind == AREA)[:, None], p_area, out)


def le_area(lights: Lights, light_id, n_l, wo):
    """Emitted radiance from an area light surface toward wo
    (the reference's `le` is identically 0, surface_interaction.jl:149)."""
    g = _gather(lights, light_id)
    front = m.dot(n_l, wo) > 0
    emits = jnp.where(g["two_sided"], jnp.ones_like(front), front)
    return jnp.where(((g["kind"] == AREA) & emits)[:, None], g["i"], 0.0)


# ---------------------------------------------------------------------------
# Blackbody SPD helpers (reference emission.jl:12-58)
# ---------------------------------------------------------------------------


def blackbody(wavelengths_nm, temperature):
    """Planck's law radiance for wavelengths in nm."""
    lam = jnp.asarray(wavelengths_nm, F32) * 1e-9
    c = 299792458.0
    h = 6.62606957e-34
    kb = 1.3806488e-23
    return (2.0 * h * c * c) / (
        lam**5 * (jnp.exp((h * c) / (lam * kb * temperature)) - 1.0)
    )


def blackbody_normalized(wavelengths_nm, temperature):
    """Normalized to peak radiance 1 via Wien's displacement law."""
    le = blackbody(wavelengths_nm, temperature)
    lam_max = 2.8977721e-3 / temperature * 1e9
    return le / blackbody(jnp.asarray([lam_max], F32), temperature)[0]
