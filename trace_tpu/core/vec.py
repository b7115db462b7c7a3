"""Planar 3-vectors: three flat component arrays instead of [N, 3].

Why this exists (the round-5 layout fix): TPU vector tiles are
(8 sublanes, 128 lanes) over an array's two minor dimensions, so ops on
[N, 3] arrays that XLA cannot flatten to 1-D (axis(-1) reductions,
[..., None] broadcasts, stacks, concatenates, minor-dim slices) run at
a fraction of lane occupancy and force narrow-layout copies between
fusions. Isolated ops hide this (they fuse into one kernel); a composed
wavefront level materializes dozens of [N, 3] intermediates between
fusions and pays it everywhere — the 7x composition tax of
ARCHITECTURE.md §7b. Measured head-to-head on v5e by
scripts/micro_unpacked.py (mini level loop, identical math in both
layouts): packed 14.8 ms vs planar 6.7 ms per depth-5 evaluation at
65536 lanes (2.2x), and compaction 5.4 ms (packed tree-gather) vs
2.0 ms (planar + one row-matrix gather).

A ``V3`` is a NamedTuple of three arrays (any matching shape, typically
flat [N]): every arithmetic op is 1-D elementwise at full lane
occupancy, dots/crosses are plain fused multiply-adds, and the pytree
registration is free (NamedTuple). Gathers/scatters over many V3s
should NOT be done per component (1-D gathers measured ~6x slower than
row gathers): pack the state into one [N, F] row matrix first — see
``pack_rows`` / ``unpack_rows``.

The packed twins of the helpers here live in core/math.py (the
reference-semantics oracle path); each function cites its twin.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

F32 = jnp.float32
PI = np.float32(3.1415926535897932)
INV_PI = np.float32(1.0 / 3.1415926535897932)
EPS = np.float32(1e-8)


def _c(v):
    """Coerce a scalar/array operand for componentwise arithmetic."""
    return v


class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- construction / conversion ----------------------------------------
    @staticmethod
    def of(arr):
        """[..., 3] -> V3 via one transpose (not 3 strided minor slices —
        see core.math.unpack3)."""
        t = jnp.moveaxis(jnp.asarray(arr), -1, 0)
        return V3(t[0], t[1], t[2])

    @staticmethod
    def full(shape, x, y, z, dtype=F32):
        return V3(jnp.full(shape, x, dtype), jnp.full(shape, y, dtype),
                  jnp.full(shape, z, dtype))

    @staticmethod
    def zeros(shape, dtype=F32):
        zz = jnp.zeros(shape, dtype)
        return V3(zz, zz, zz)

    def arr(self):
        """V3 -> [..., 3] via one transpose (core.math.pack3)."""
        return jnp.moveaxis(jnp.stack([self.x, self.y, self.z], axis=0),
                            0, -1)

    # -- arithmetic ---------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return V3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    # -- geometry -----------------------------------------------------------
    def dot(self, o: "V3"):
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o: "V3") -> "V3":
        return V3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def length_squared(self):
        return self.x * self.x + self.y * self.y + self.z * self.z

    def length(self):
        return jnp.sqrt(self.length_squared())

    def normalize(self) -> "V3":
        """Zero-guarded like core.math.normalize (n == 0 passes through)."""
        n = self.length()
        inv = 1.0 / jnp.where(n == 0.0, 1.0, n)
        return self * inv

    def abs(self) -> "V3":
        return V3(jnp.abs(self.x), jnp.abs(self.y), jnp.abs(self.z))

    def max_component(self):
        return jnp.maximum(jnp.maximum(self.x, self.y), self.z)

    def sum(self):
        return self.x + self.y + self.z

    def astype(self, dt) -> "V3":
        return V3(self.x.astype(dt), self.y.astype(dt), self.z.astype(dt))

    def is_black(self):
        """Spectrum helper (core.spectrum.is_black twin)."""
        return (self.x == 0.0) & (self.y == 0.0) & (self.z == 0.0)


def where(c, a, b):
    """Componentwise select; c is a plain mask (no [..., None] needed),
    a/b are V3 or scalars."""
    ax, ay, az = (a.x, a.y, a.z) if isinstance(a, V3) else (a, a, a)
    bx, by, bz = (b.x, b.y, b.z) if isinstance(b, V3) else (b, b, b)
    return V3(jnp.where(c, ax, bx), jnp.where(c, ay, by),
              jnp.where(c, az, bz))


def maximum(a, b):
    ax, ay, az = (a.x, a.y, a.z) if isinstance(a, V3) else (a, a, a)
    bx, by, bz = (b.x, b.y, b.z) if isinstance(b, V3) else (b, b, b)
    return V3(jnp.maximum(ax, bx), jnp.maximum(ay, by), jnp.maximum(az, bz))


def minimum(a, b):
    ax, ay, az = (a.x, a.y, a.z) if isinstance(a, V3) else (a, a, a)
    bx, by, bz = (b.x, b.y, b.z) if isinstance(b, V3) else (b, b, b)
    return V3(jnp.minimum(ax, bx), jnp.minimum(ay, by), jnp.minimum(az, bz))


def lerp(a: V3, b: V3, t):
    return a * (1.0 - t) + b * t


def face_forward(n: V3, v: V3) -> V3:
    """core.math.face_forward twin (Trace.jl:168)."""
    return where(n.dot(v) < 0.0, -n, n)


def reflect(wo: V3, n: V3) -> V3:
    """core.math.reflect twin (Trace.jl:126)."""
    return -wo + n * (2.0 * wo.dot(n))


def refract(wi: V3, n: V3, eta):
    """core.math.refract twin (bxdf.jl:52-62): (valid, wt)."""
    cos_ti = n.dot(wi)
    sin2_ti = jnp.maximum(0.0, 1.0 - cos_ti * cos_ti)
    sin2_tt = eta * eta * sin2_ti
    valid = sin2_tt < 1.0
    cos_tt = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_tt))
    wt = wi * (-eta) + n * (eta * cos_ti - cos_tt)
    return valid, where(valid, wt, V3.zeros(cos_ti.shape))


def coordinate_system(v1: V3):
    """core.math.coordinate_system twin (Trace.jl:139-146)."""
    c = jnp.abs(v1.x) > jnp.abs(v1.y)
    inv_a = 1.0 / jnp.sqrt(
        jnp.where(c, v1.x * v1.x + v1.z * v1.z, v1.y * v1.y + v1.z * v1.z)
    )
    zeros = jnp.zeros_like(inv_a)
    v2 = where(
        c,
        V3(-v1.z * inv_a, zeros, v1.x * inv_a),
        V3(zeros, v1.z * inv_a, -v1.y * inv_a),
    )
    return v1, v2, v1.cross(v2)


def mat3_apply(m33, v: V3) -> V3:
    """Per-lane 3x3 matrix apply in exact-f32 VPU arithmetic (twin of
    core.math.mat3_apply — einsum would lower to bf16 MXU). ``m33`` is
    [..., 3, 3] with leading dims broadcastable against the components,
    or a nested 3x3 sequence of arrays/scalars."""
    r = _rows(m33)
    return V3(
        r[0][0] * v.x + r[0][1] * v.y + r[0][2] * v.z,
        r[1][0] * v.x + r[1][1] * v.y + r[1][2] * v.z,
        r[2][0] * v.x + r[2][1] * v.y + r[2][2] * v.z,
    )


def mat3_apply_t(m33, v: V3) -> V3:
    """Transpose apply (normals' inverse-transpose rule)."""
    r = _rows(m33)
    return V3(
        r[0][0] * v.x + r[1][0] * v.y + r[2][0] * v.z,
        r[0][1] * v.x + r[1][1] * v.y + r[2][1] * v.z,
        r[0][2] * v.x + r[1][2] * v.y + r[2][2] * v.z,
    )


def _rows(m33):
    if isinstance(m33, (list, tuple)):
        return m33
    t = jnp.moveaxis(jnp.moveaxis(jnp.asarray(m33), -1, 0), -1, 0)
    return [[t[j, i] for j in range(3)] for i in range(3)]  # t[col, row]


# ---------------------------------------------------------------------------
# Monte-Carlo sampling helpers on scalar (u1, u2) components
# (core.math.concentric_sample_disk etc. twins, Trace.jl:48-96)
# ---------------------------------------------------------------------------


def concentric_sample_disk(u1, u2):
    ox = 2.0 * u1 - 1.0
    oy = 2.0 * u2 - 1.0
    degenerate = (jnp.abs(ox) < EPS) & (jnp.abs(oy) < EPS)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    safe_ox = jnp.where(jnp.abs(ox) < EPS, 1.0, ox)
    safe_oy = jnp.where(jnp.abs(oy) < EPS, 1.0, oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(
        use_x,
        (oy / safe_ox) * (PI / 4.0),
        PI / 2.0 - (ox / safe_oy) * (PI / 4.0),
    )
    px = r * jnp.cos(theta)
    py = r * jnp.sin(theta)
    zero = jnp.zeros_like(px)
    return (jnp.where(degenerate, zero, px), jnp.where(degenerate, zero, py))


def cosine_sample_hemisphere(u1, u2) -> V3:
    dx, dy = concentric_sample_disk(u1, u2)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - dx * dx - dy * dy))
    return V3(dx, dy, z)


def uniform_sample_sphere(u1, u2) -> V3:
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u2
    return V3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def uniform_sample_cone(u1, u2, cos_t_max) -> V3:
    cos_t = 1.0 - u1 + u1 * cos_t_max
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = u2 * 2.0 * PI
    return V3(jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t)


def spherical_direction(sin_t, cos_t, phi) -> V3:
    return V3(sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t)


# ---------------------------------------------------------------------------
# Shading-frame trig on planar local-frame vectors (normal = +z)
# (core.math.cos_theta family twins, Trace.jl:109-126)
# ---------------------------------------------------------------------------


def cos_theta(w: V3):
    return w.z


def cos2_theta(w: V3):
    return w.z * w.z


def sin2_theta(w: V3):
    return jnp.maximum(0.0, 1.0 - w.z * w.z)


def sin_theta(w: V3):
    return jnp.sqrt(sin2_theta(w))


def cos_phi(w: V3):
    s = sin_theta(w)
    return jnp.where(s < 1e-8, 1.0,
                     jnp.clip(w.x / jnp.where(s < 1e-8, 1.0, s), -1.0, 1.0))


def sin_phi(w: V3):
    s = sin_theta(w)
    return jnp.where(s < 1e-8, 1.0,
                     jnp.clip(w.y / jnp.where(s < 1e-8, 1.0, s), -1.0, 1.0))


def same_hemisphere(w: V3, wp: V3):
    return w.z * wp.z > 0


# ---------------------------------------------------------------------------
# Row-matrix packing for gathers/compaction.
#
# 1-D gathers lower to per-element moves (~6x slower than row gathers at
# 131072 lanes, scripts/micro_unpacked.py compact_1d vs compact_rowmat);
# a [N, F] f32 row matrix gathers at full tile width. Ints/bools ride
# along bitcast/cast to f32 (gather is pure data movement).
# ---------------------------------------------------------------------------


def pack_rows(leaves):
    """List of [N] arrays (f32 / i32 / u32 / bool) -> ([N, F] f32 matrix,
    dtype list for unpack_rows)."""
    cols, dts = [], []
    for a in leaves:
        dts.append(a.dtype)
        if a.dtype == jnp.bool_:
            cols.append(a.astype(F32))
        elif a.dtype in (jnp.int32, jnp.uint32):
            cols.append(jax.lax.bitcast_convert_type(a, F32))
        else:
            cols.append(a.astype(F32))
    return jnp.moveaxis(jnp.stack(cols, axis=0), 0, -1), dts


def unpack_rows(mat, dts):
    """Inverse of pack_rows: [N, F] f32 -> list of [N] arrays."""
    t = jnp.moveaxis(mat, -1, 0)
    out = []
    for i, dt in enumerate(dts):
        col = t[i]
        if dt == jnp.bool_:
            out.append(col != 0.0)
        elif dt in (jnp.int32, jnp.uint32):
            out.append(jax.lax.bitcast_convert_type(col, dt))
        else:
            out.append(col.astype(dt))
    return out


def tree_rows(tree):
    """Flatten a pytree of [N] leaves to (matrix, treedef, dtypes)."""
    leaves, treedef = jax.tree.flatten(tree)
    mat, dts = pack_rows(leaves)
    return mat, treedef, dts


def rows_tree(mat, treedef, dts):
    return jax.tree.unflatten(treedef, unpack_rows(mat, dts))


def tree_gather(tree, idx):
    """Gather a pytree of [N]-leaf state by ``idx`` via ONE row-matrix
    gather (the compaction fast path)."""
    mat, treedef, dts = tree_rows(tree)
    return rows_tree(mat[idx], treedef, dts)
