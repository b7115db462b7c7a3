"""4x4 transformations with cached inverses, plus quaternions.

TPU-native counterpart of /root/reference/src/transformations.jl. A
``Transform`` is a pytree of (m, inv_m) matrices; constructors build both the
matrix and its analytic inverse so no runtime matrix inversion is needed on
the hot path. Application to points/vectors/normals/bounds/rays broadcasts
over leading dims (the matrices themselves may also be batched ``[..., 4, 4]``
which is how packed per-shape transforms are stored on device).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.pytree import pytree
from . import math as m
from .bounds import Bounds3, corner, union_point, from_point

F32 = jnp.float32


@pytree
class Transform:
    m: jnp.ndarray      # [..., 4, 4]
    inv_m: jnp.ndarray  # [..., 4, 4]


def identity() -> Transform:
    # Constructors build host (numpy) matrices: transforms are scene-build
    # data, and reading device arrays back mid-build (np.asarray on a jnp
    # array) permanently degrades the TPU relay's dispatch latency.
    i = np.eye(4, dtype=np.float32)
    return Transform(i, i)


def from_matrix(mat) -> Transform:
    mat = np.asarray(mat, np.float32)
    return Transform(mat, np.linalg.inv(mat).astype(np.float32))


def inverse(t: Transform) -> Transform:
    return Transform(t.inv_m, t.m)


def compose(t1: Transform, t2: Transform, *rest: Transform) -> Transform:
    """t1 * t2 * ... (rightmost applies first)."""
    out = Transform(t1.m @ t2.m, t2.inv_m @ t1.inv_m)
    for t in rest:
        out = Transform(out.m @ t.m, t.inv_m @ out.inv_m)
    return out


def translate(delta) -> Transform:
    d = np.asarray(delta, np.float32)
    mat = np.eye(4, dtype=np.float32)
    mat[:3, 3] = d
    inv = np.eye(4, dtype=np.float32)
    inv[:3, 3] = -d
    return Transform(mat, inv)


def scale(x, y, z) -> Transform:
    mat = np.diag(np.array([x, y, z, 1.0], np.float32))
    inv = np.diag(np.array([1.0 / x, 1.0 / y, 1.0 / z, 1.0], np.float32))
    return Transform(mat, inv)


def _rot(mat3: np.ndarray) -> Transform:
    mat = np.eye(4, dtype=np.float32)
    mat[:3, :3] = mat3
    return Transform(mat, mat.T.copy())


def rotate_x(deg: float) -> Transform:
    s, c = np.sin(np.deg2rad(deg)), np.cos(np.deg2rad(deg))
    return _rot(np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32))


def rotate_y(deg: float) -> Transform:
    s, c = np.sin(np.deg2rad(deg)), np.cos(np.deg2rad(deg))
    return _rot(np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32))


def rotate_z(deg: float) -> Transform:
    s, c = np.sin(np.deg2rad(deg)), np.cos(np.deg2rad(deg))
    return _rot(np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32))


def rotate(deg: float, axis) -> Transform:
    """Rotation about an arbitrary axis (reference transformations.jl:92-103)."""
    a = np.asarray(axis, np.float32)
    a = a / np.linalg.norm(a)
    s, c = np.sin(np.deg2rad(deg)), np.cos(np.deg2rad(deg))
    m3 = np.array(
        [
            [
                a[0] * a[0] + (1 - a[0] * a[0]) * c,
                a[0] * a[1] * (1 - c) - a[2] * s,
                a[0] * a[2] * (1 - c) + a[1] * s,
            ],
            [
                a[0] * a[1] * (1 - c) + a[2] * s,
                a[1] * a[1] + (1 - a[1] * a[1]) * c,
                a[1] * a[2] * (1 - c) - a[0] * s,
            ],
            [
                a[0] * a[2] * (1 - c) - a[1] * s,
                a[1] * a[2] * (1 - c) + a[0] * s,
                a[2] * a[2] + (1 - a[2] * a[2]) * c,
            ],
        ],
        np.float32,
    )
    return _rot(m3)


def look_at(position, target, up) -> Transform:
    """Camera-to-world transform (reference transformations.jl:105-117)."""
    position = np.asarray(position, np.float32)
    target = np.asarray(target, np.float32)
    up = np.asarray(up, np.float32)
    z_axis = position - target
    z_axis = z_axis / np.linalg.norm(z_axis)
    x_axis = np.cross(up, z_axis)
    x_axis = x_axis / np.linalg.norm(x_axis)
    y_axis = np.cross(z_axis, x_axis)
    rot = np.eye(4, dtype=np.float32)
    rot[:3, 0] = x_axis
    rot[:3, 1] = y_axis
    rot[:3, 2] = z_axis
    return compose(translate(position), Transform(rot, rot.T.copy()))


def compose_ref(t1: Transform, t2: Transform) -> Transform:
    """The reference's literal composition (transformations.jl:20-22):
    the cached inverse multiplies in the SAME order as the forward matrix
    — NOT a true inverse unless the factors commute. The camera chain's
    raster_to_screen is the inv slot of such a wrong-order product
    (camera/perspective.jl:31), which shifts the effective screen window
    by +1 in x and y for the stock (-1,-1)..(1,1) window: replicate it
    (under convention="reference") or the rendered framing diverges from
    actual Julia output by a full screen unit (verified numerically)."""
    return Transform(
        np.asarray(t1.m @ t2.m, np.float32),
        np.asarray(t1.inv_m @ t2.inv_m, np.float32),
    )


def dir_to_z(d) -> Transform:
    """World-to-local frame that maps direction ``d`` onto +z — the spot
    light aiming frame the reference scenes build inline
    (caustic_glass.jl:49-66: coordinate_system rows stacked into a
    matrix). Host numpy (device round-trips mid scene-build poison the
    relay); the branch mirrors core/math.py:coordinate_system."""
    d = np.asarray(d, np.float32)
    d = d / np.linalg.norm(d)
    if abs(d[0]) > abs(d[1]):
        du = np.array([-d[2], 0.0, d[0]], np.float32)
        du /= np.sqrt(d[0] * d[0] + d[2] * d[2])
    else:
        du = np.array([0.0, d[2], -d[1]], np.float32)
        du /= np.sqrt(d[1] * d[1] + d[2] * d[2])
    dv = np.cross(d, du)
    mat = np.eye(4, dtype=np.float32)
    mat[0, :3] = du
    mat[1, :3] = dv
    mat[2, :3] = d
    # Rows are orthonormal: the inverse is exactly the transpose (same
    # form as look_at/_rot; avoids an f32 np.linalg.inv round-off).
    return Transform(mat, mat.T.copy())


def perspective(fov: float, near: float, far: float) -> Transform:
    """Perspective projection (reference transformations.jl:119-130).

    NOTE: the reference builds its projective-divide matrix without the
    `transpose(...)` wrapper used by every other constructor, and Julia's
    Mat4f constructor is column-major — so the effective (row-major) matrix
    is the transpose of what the source visually reads as:
        [[1,0,0,0], [0,1,0,0], [0,0,A,1], [0,0,B,0]],
    A = far/(far-near), B = -far*near/(far-near).
    Consequences (verified numerically): a screen point (xs, ys, 0) maps to
    camera space (near*tan(fov/2)*xs, near*tan(fov/2)*ys, -(far-near)/far),
    i.e. camera rays travel toward -z and the effective field of view is
    2*atan(near*tan(fov/2)) — a telephoto view. We replicate this exactly
    for pixel parity with the reference's renders.
    """
    a = far / (far - near)
    b = -far * near / (far - near)
    p = np.array(
        [
            [1, 0, 0, 0],
            [0, 1, 0, 0],
            [0, 0, a, 1],
            [0, 0, b, 0],
        ],
        np.float32,
    )
    inv_tan = 1.0 / np.tan(np.deg2rad(fov) / 2.0)
    return compose(scale(inv_tan, inv_tan, 1.0), from_matrix(p))


def perspective_pbrt(fov: float, near: float, far: float) -> Transform:
    """Standard PBRT perspective projection — what the reference's source
    visually reads as, i.e. `perspective` WITHOUT the column-major
    transposition quirk. Provided for well-framed renders; the quirky
    `perspective` stays the default for pixel parity with the reference's
    conventions (verified by projecting its spheres.jl scene through the
    literal Julia math)."""
    a = far / (far - near)
    b = -far * near / (far - near)
    p = np.array(
        [
            [1, 0, 0, 0],
            [0, 1, 0, 0],
            [0, 0, a, b],
            [0, 0, 1, 0],
        ],
        np.float32,
    )
    inv_tan = 1.0 / np.tan(np.deg2rad(fov) / 2.0)
    return compose(scale(inv_tan, inv_tan, 1.0), from_matrix(p))


# --- application -----------------------------------------------------------


def apply_point(t: Transform, p):
    """Apply to points [..., 3] with perspective divide. Exact f32
    component arithmetic — einsum would hit the MXU's bf16 default
    (see core.math.mat3_apply). Component extraction goes through
    math.unpack3/pack3 (single-transpose data movement) — the naive
    ``p[..., k]`` strided slices dominated the profiled wavefront loop
    (ARCHITECTURE.md §7b)."""
    mm = jnp.asarray(t.m)
    p0, p1, p2 = m.unpack3(p)
    r = [
        mm[..., i, 0] * p0 + mm[..., i, 1] * p1
        + mm[..., i, 2] * p2 + mm[..., i, 3]
        for i in range(3)
    ]
    w = mm[..., 3, 0] * p0 + mm[..., 3, 1] * p1 \
        + mm[..., 3, 2] * p2 + mm[..., 3, 3]
    is_affine = w == 1.0
    return m.pack3(*[jnp.where(is_affine, ri, ri / w) for ri in r])


def apply_vec(t: Transform, v):
    return m.mat3_apply(jnp.asarray(t.m)[..., :3, :3], v)


def apply_normal(t: Transform, n):
    """Normals transform by the inverse transpose (transformations.jl:140)."""
    return m.mat3_apply_t(jnp.asarray(t.inv_m)[..., :3, :3], n)


def apply_bounds(t: Transform, b: Bounds3) -> Bounds3:
    out = from_point(apply_point(t, corner(b, 0)))
    for c in range(1, 8):
        out = union_point(out, apply_point(t, corner(b, c)))
    return out


def swaps_handedness(t: Transform):
    return jnp.linalg.det(t.m[..., :3, :3]) < 0


def has_scale(t: Transform):
    a = m.length(apply_vec(t, jnp.array([1.0, 0, 0], F32)))
    b = m.length(apply_vec(t, jnp.array([0.0, 1, 0], F32)))
    c = m.length(apply_vec(t, jnp.array([0.0, 0, 1], F32)))
    eps = 1e-4
    return (jnp.abs(a - 1) > eps) | (jnp.abs(b - 1) > eps) | (jnp.abs(c - 1) > eps)


# --- quaternions (reference transformations.jl:167-244) --------------------


@pytree
class Quaternion:
    v: jnp.ndarray  # [..., 3]
    w: jnp.ndarray  # [...]


def quat_identity() -> Quaternion:
    return Quaternion(jnp.zeros(3, F32), jnp.asarray(1.0, F32))


def quat_from_transform(t: Transform) -> Quaternion:
    """Matrix -> quaternion (trace > 0 branch + largest-diagonal fallback)."""
    mat = t.m
    tr = mat[..., 0, 0] + mat[..., 1, 1] + mat[..., 2, 2]

    # Branch A: trace > 0.
    s_a = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12))
    w_a = s_a / 2.0
    k_a = 0.5 / s_a
    v_a = m.vec(
        (mat[..., 2, 1] - mat[..., 1, 2]) * k_a,
        (mat[..., 0, 2] - mat[..., 2, 0]) * k_a,
        (mat[..., 1, 0] - mat[..., 0, 1]) * k_a,
    )

    # Branch B: largest diagonal element i, with j, k the cyclic successors.
    def branch_b(i):
        j, k = (i + 1) % 3, (i + 2) % 3
        s = jnp.sqrt(
            jnp.maximum(mat[..., i, i] - (mat[..., j, j] + mat[..., k, k]) + 1.0, 1e-12)
        )
        q = [None, None, None]
        q[i] = s * 0.5
        ks = jnp.where(s != 0.0, 0.5 / s, 0.0)
        q[j] = (mat[..., j, i] + mat[..., i, j]) * ks
        q[k] = (mat[..., k, i] + mat[..., i, k]) * ks
        w = (mat[..., k, j] - mat[..., j, k]) * ks
        return m.vec(q[0], q[1], q[2]), w

    i0 = jnp.where(
        mat[..., 1, 1] > mat[..., 0, 0],
        jnp.where(mat[..., 2, 2] > mat[..., 1, 1], 2, 1),
        jnp.where(mat[..., 2, 2] > mat[..., 0, 0], 2, 0),
    )
    vb0, wb0 = branch_b(0)
    vb1, wb1 = branch_b(1)
    vb2, wb2 = branch_b(2)
    v_b = jnp.where((i0 == 0)[..., None], vb0, jnp.where((i0 == 1)[..., None], vb1, vb2))
    w_b = jnp.where(i0 == 0, wb0, jnp.where(i0 == 1, wb1, wb2))

    pos = tr > 0.0
    return Quaternion(jnp.where(pos[..., None], v_a, v_b), jnp.where(pos, w_a, w_b))


def quat_to_transform(q: Quaternion) -> Transform:
    x, y, z = q.v[..., 0], q.v[..., 1], q.v[..., 2]
    w = q.w
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy), jnp.zeros_like(w)], -1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx), jnp.zeros_like(w)], -1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy), jnp.zeros_like(w)], -1)
    row3 = jnp.stack([jnp.zeros_like(w)] * 3 + [jnp.ones_like(w)], -1)
    mat = jnp.stack([row0, row1, row2, row3], axis=-2)
    return Transform(mat, jnp.swapaxes(mat, -1, -2))


def quat_dot(q1: Quaternion, q2: Quaternion):
    return m.dot(q1.v, q2.v) + q1.w * q2.w


def quat_normalize(q: Quaternion) -> Quaternion:
    n = jnp.sqrt(quat_dot(q, q))
    return Quaternion(q.v / n[..., None], q.w / n)


def slerp(q1: Quaternion, q2: Quaternion, t):
    """Spherical lerp (reference transformations.jl:236-244)."""
    cos_t = quat_dot(q1, q2)

    # Nearly-parallel: plain lerp.
    lin = quat_normalize(
        Quaternion(m.lerp(q1.v, q2.v, t[..., None] if jnp.ndim(t) else t), m.lerp(q1.w, q2.w, t))
    )

    theta = jnp.arccos(jnp.clip(cos_t, -1.0, 1.0))
    theta_p = theta * t
    perp = Quaternion(q2.v - q1.v * cos_t[..., None], q2.w - q1.w * cos_t)
    nperp = jnp.sqrt(jnp.maximum(quat_dot(perp, perp), 1e-12))
    perp = Quaternion(perp.v / nperp[..., None], perp.w / nperp)
    sph = Quaternion(
        q1.v * jnp.cos(theta_p)[..., None] + perp.v * jnp.sin(theta_p)[..., None],
        q1.w * jnp.cos(theta_p) + perp.w * jnp.sin(theta_p),
    )
    near = cos_t > 0.9995
    return Quaternion(
        jnp.where(near[..., None] if jnp.ndim(near) else near, lin.v, sph.v),
        jnp.where(near, lin.w, sph.w),
    )
