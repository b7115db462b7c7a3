"""Ray-triangle intersection on the MXU (matmul-factored Moller-Trumbore).

The TPU's FLOPs live in its 128x128 systolic array, not in elementwise
lanes. Every Moller-Trumbore determinant is a triple product that
factorizes into a product of per-ray and per-triangle constants:

    det   = -d . n                    n  = e1 x e2
    u*det =  (o x d) . e2  -  d . w   w  = e2 x v0
    v*det = -(o x d) . e1  -  d . q   q  = v0 x e1
    t*det =  o . n        -  (v0 . n)

so the whole [R, T] pair grid is SIX [R,3] @ [3,T] matmuls plus
elementwise sign logic — the MXU does in milliseconds what the vmapped
stack traversal of the reference's BVH (bvh.jl:212-299) cannot express on
this hardware at all. Combined with the cluster cut (accel/clusters.py)
the candidate set T shrinks per stage; for <=100k-triangle scenes plain
chunked brute force on the MXU is already faster than any traversal we
measured.

Deviation: Moller-Trumbore edge rules differ from the reference's
watertight shear test (triangle_mesh.jl:99-123) in boundary ulps; hits on
shared edges may resolve to the neighbouring triangle.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.pytree import pytree
from ..shapes import sphere as sph_mod
from ..shapes import triangle as tri_mod

F32 = jnp.float32


@pytree
class TriMatmulConsts:
    """Per-triangle constants, laid out [3, T] for direct use as matmul
    right-hand sides."""

    n: jnp.ndarray       # [3, T] e1 x e2
    e1: jnp.ndarray      # [3, T]
    e2: jnp.ndarray      # [3, T]
    w: jnp.ndarray       # [3, T] e2 x v0
    q: jnp.ndarray       # [3, T] v0 x e1
    v0n: jnp.ndarray     # [T]    v0 . n
    degenerate: jnp.ndarray  # [T] bool


def build_consts(tris: tri_mod.Triangles) -> TriMatmulConsts:
    v0 = np.asarray(tris.v0, np.float64)
    v1 = np.asarray(tris.v1, np.float64)
    v2 = np.asarray(tris.v2, np.float64)
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    w = np.cross(e2, v0)
    q = np.cross(v0, e1)
    v0n = np.einsum("ij,ij->i", v0, n)
    degen = (n * n).sum(-1) < 1e-16
    # Host (numpy) leaves: device consts d2h at jit trace (relay poison).
    f = lambda x: np.ascontiguousarray(x.T, dtype=np.float32)
    return TriMatmulConsts(
        f(n), f(e1), f(e2), f(w), f(q),
        np.asarray(v0n, np.float32), np.asarray(degen),
    )


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def mt_epilogue(det, u_det, v_det, t_det, eps=1e-12):
    """Sign-folded Moller-Trumbore validity + t from the four determinant
    panels. THE canonical epilogue for every matmul-factored intersector
    (this module, accel/clusters._test_stage_mt, ops/sweep_pallas,
    ops/intersect_pallas — all call it; elementwise jnp only, so it works
    inside Pallas kernels too). Returns (ok, t): ok covers the
    orientation-independent det/barycentric/positivity tests; callers AND
    in their own t-boundary convention (t <= t_max for the brute-force
    grid, strict t < limit in the running-minimum sweeps) and id masks.
    """
    sign = jnp.where(det < 0.0, -1.0, 1.0)
    adet = det * sign
    u = u_det * sign
    v = v_det * sign
    tn = t_det * sign
    t = tn / jnp.where(adet > eps, adet, 1.0)
    ok = (adet > eps) & (u >= 0.0) & (v >= 0.0) & (u + v <= adet) & (tn > 0.0)
    return ok, t


# Certified error-bound multiplier for the widened epilogue below.
# Derivation (all quantities f32, matmuls at Precision.HIGHEST so each
# K=3 dot rounds like a scalar f32 dot):
#   - m = cross(o, d): each component |δm_i| <= 2 eps |o_j||d_k|+|o_k||d_j|
#     (two products + one subtraction), propagating |δm·e2| <= 2 eps (ma·|e2|)
#     with ma the ABS-cross;
#   - each 3-term dot + the dot-difference: <= 4 eps of the abs-dot sums;
#   - the panel constants were rounded f64 -> f32 once: <= 1 eps each.
# 8 covers 2 + 4 + 1 with margin; overestimating the tolerance only
# fattens silhouette edges by sub-ulp geometric amounts, never drops hits.
MT_ERR_EPS = np.float32(8.0 * 2.0 ** -24)


def abs_cross(a_abs, b_abs):
    """Component-wise |a|x|b| upper bound of |cross(a, b)|: the cross
    formula with every subtraction replaced by addition. Inputs are the
    element-wise absolutes, [..., 3]."""
    ax, ay, az = a_abs[..., 0], a_abs[..., 1], a_abs[..., 2]
    bx, by, bz = b_abs[..., 0], b_abs[..., 1], b_abs[..., 2]
    return jnp.stack(
        [ay * bz + az * by, az * bx + ax * bz, ax * by + ay * bx],
        axis=-1,
    )


def mt_epilogue_certified(det, u_det, v_det, t_det,
                          err_det, err_u, err_v, err_t, eps=1e-12):
    """Widened (certified-conservative) variant of :func:`mt_epilogue`:
    each boundary test is relaxed by a CERTIFIED upper bound on its own
    f32 rounding error, so a ray whose exact intersection lies on a shared
    mesh edge is accepted by at least one of the adjacent triangles — the
    hot-path counterpart of the reference's Float64 edge-function fallback
    (triangle_mesh.jl:194-197). Cost: the error bounds are abs-matmuls on
    panels already resident in VMEM — extra MXU FLOPs (the unit idles at
    ~2% on the base contraction), zero extra HBM traffic. Deviation from
    the exact test: silhouette (non-shared) edges are fattened by the
    error radius — the price of certainty, measured in ulps of the local
    geometric scale."""
    sign = jnp.where(det < 0.0, -1.0, 1.0)
    adet = det * sign
    u = u_det * sign
    v = v_det * sign
    tn = t_det * sign
    # Grazing rays stay excluded: below err_det the folded sign itself is
    # uncertain (same role as the reference's near-zero-det rejection).
    live = adet > jnp.maximum(eps, err_det)
    t = tn / jnp.where(live, adet, 1.0)
    ok = (
        live
        & (u >= -err_u)
        & (v >= -err_v)
        & (u + v <= adet + err_u + err_v + err_det)
        & (tn > -err_t)
    )
    return ok, t


def intersect_grid(consts: TriMatmulConsts, o, d, t_max):
    """All-pairs Moller-Trumbore over [R rays x T tris] via 6 matmuls.

    Returns (hit [R,T] bool, t [R,T] f32 — valid only where hit).
    """
    m = jnp.cross(o, d)                      # [R, 3]
    det = -_mm(d, consts.n)                  # [R, T]
    u_det = _mm(m, consts.e2) - _mm(d, consts.w)
    v_det = -_mm(m, consts.e1) - _mm(d, consts.q)
    t_det = _mm(o, consts.n) - consts.v0n[None, :]

    ok, t = mt_epilogue(det, u_det, v_det, t_det)
    hit = ok & ~consts.degenerate[None, :] & (t <= t_max[:, None])
    return hit, t


class MXUAccelerator:
    """Chunked all-pairs MXU intersector (brute force, but on the matrix
    unit). tri_chunk bounds the [R, chunk] working set."""

    def __init__(self, consts: TriMatmulConsts, n_triangles: int,
                 tri_chunk: int = 8192):
        self.consts = consts
        self.n_triangles = int(n_triangles)
        self.tri_chunk = int(tri_chunk)

    def _sweep(self, o, d, t_max, any_hit):
        n = o.shape[0]
        t_total = self.n_triangles
        chunk = min(self.tri_chunk, max(t_total, 1))
        best_t = jnp.full((n,), jnp.inf, F32)
        best_i = jnp.full((n,), -1, jnp.int32)
        for s in range(0, t_total, chunk):
            e = min(s + chunk, t_total)
            part = jax.tree.map(
                lambda x: x[..., s:e] if x.ndim == 2 else x[s:e], self.consts
            )
            hit, t = intersect_grid(part, o, d, t_max)
            t = jnp.where(hit, t, jnp.inf)
            li = jnp.argmin(t, axis=-1)
            lt = jnp.min(t, axis=-1)  # == t[li], no gather
            better = lt < best_t
            best_t = jnp.where(better, lt, best_t)
            best_i = jnp.where(better, li.astype(jnp.int32) + s, best_i)
        hit = (best_i >= 0) & (best_t <= t_max)
        return hit, jnp.where(hit, best_t, jnp.inf), jnp.maximum(best_i, 0)

    def closest(self, scene, o, d, t_max):
        n = o.shape[0]
        no_hit = (jnp.zeros(n, bool), jnp.full(n, jnp.inf, F32),
                  jnp.zeros(n, jnp.int32))
        hs = (
            sph_mod.intersect_closest(scene.spheres, o, d, t_max)
            if scene.n_spheres else no_hit
        )
        ht = (
            self._sweep(o, d, t_max, False)
            if scene.n_triangles else no_hit
        )
        return hs, ht

    def any_hit(self, scene, o, d, t_max):
        n = o.shape[0]
        occ = jnp.zeros(n, bool)
        if scene.n_spheres:
            occ = occ | sph_mod.intersect_p(scene.spheres, o, d, t_max)
        if scene.n_triangles:
            h, t, _ = self._sweep(o, d, t_max, True)
            occ = occ | (h & (t <= t_max))
        return occ


def attach(scene, tri_chunk: int = 8192):
    if scene.n_triangles == 0:
        return scene
    consts = build_consts(getattr(scene, "triangles_host", scene.triangles))
    scene.bump_version()
    scene.accel = MXUAccelerator(consts, scene.n_triangles, tri_chunk)
    return scene
