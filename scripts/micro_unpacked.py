"""Decisive layout probe: a mini-Whitted level loop, packed vs planar.

micro_layout.py's single-op k-differenced numbers are noise-dominated at
the µs scale (negative medians through the relay). This probe times the
REAL composition shape — a depth-5 wavefront level loop over 65536 lanes
(brute-force sphere intersect, lambert shading + shadow ray, scatter-add
into l_buf, two specular children, compaction back to capacity) — in two
layouts:

  packed: today's production form — [N,3] vectors, axis(-1) dots,
          [..., None] broadcasts, tree-map concatenate + argsort-gather
          compaction (every materialized [N,3] intermediate pads its
          minor dim 3 -> 128 lanes in HBM, a 42x inflation).
  planar: every vector is three [N] component arrays; all arithmetic is
          1-D elementwise at full lane occupancy; compaction packs the
          live state into ONE [2N, F] row matrix (rows gather at full
          tile width; ints ride along bitcast to f32) and unpacks after.

Also times the compaction styles in isolation (packed tree-gather vs
row-matrix vs per-component 1-D gathers) to separate compute layout from
gather layout. Cumulative JSON after every probe.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-axon")

N = 65536
S = 8          # spheres
DEPTH = 5
F32 = jnp.float32


def _force(x):
    return np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[0])


def diff_time(run_k, k_lo, k_hi, reps=3):
    run_k(k_lo)
    ds = [(run_k(k_hi) - run_k(k_lo)) / (k_hi - k_lo) for _ in range(reps)]
    return float(np.median(ds))


# --------------------------------------------------------------------------
# Shared scene constants (host numpy: embed free at trace time)
# --------------------------------------------------------------------------
rng = np.random.default_rng(0)
C = rng.uniform(-4, 4, (S, 3)).astype(np.float32)       # centers
R = rng.uniform(0.5, 1.5, S).astype(np.float32)          # radii
ALB = rng.uniform(0.2, 0.9, (S, 3)).astype(np.float32)   # albedo
LP = np.array([0.0, 8.0, 0.0], np.float32)               # light pos


# --------------------------------------------------------------------------
# PACKED variant ([N, 3] vectors — production layout)
# --------------------------------------------------------------------------
def packed_li(o, d, key):
    n = o.shape[0]
    cap = n
    queue = dict(
        o=o, d=d,
        beta=jnp.ones((n, 3), F32),
        slot=jnp.arange(n, dtype=jnp.int32),
        active=jnp.ones((n,), bool),
    )

    def intersect(o, d):
        oc = o[:, None, :] - jnp.asarray(C)[None]           # [N,S,3]
        b = 2.0 * jnp.sum(oc * d[:, None, :], -1)
        c = jnp.sum(oc * oc, -1) - jnp.asarray(R)[None] ** 2
        disc = b * b - 4.0 * c
        ok = disc >= 0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = 0.5 * (-b - sq)
        t1 = 0.5 * (-b + sq)
        t = jnp.where(t0 > 1e-3, t0, t1)
        t = jnp.where(ok & (t > 1e-3), t, jnp.inf)
        idx = jnp.argmin(t, -1).astype(jnp.int32)
        tb = jnp.min(t, -1)
        return jnp.isfinite(tb), tb, idx

    def anyhit(o, d):
        h, t, _ = intersect(o, d)
        return h

    def body(depth, carry):
        l_buf, queue = carry
        o, d = queue["o"], queue["d"]
        hit, t, idx = intersect(o, d)
        valid = queue["active"] & hit
        p = o + t[..., None] * d
        nrm = p - jnp.asarray(C)[idx]
        nrm = nrm / jnp.maximum(
            jnp.sqrt(jnp.sum(nrm * nrm, -1)), 1e-9)[..., None]
        wi = jnp.asarray(LP)[None] - p
        wi = wi / jnp.maximum(jnp.sqrt(jnp.sum(wi * wi, -1)), 1e-9)[..., None]
        vis = ~anyhit(p + 1e-3 * wi, wi)
        alb = jnp.asarray(ALB)[idx]
        cosw = jnp.maximum(jnp.sum(nrm * wi, -1), 0.0)
        contrib = queue["beta"] * alb * (cosw * vis)[..., None]
        l_buf = l_buf.at[queue["slot"]].add(
            jnp.where(valid[..., None], contrib, 0.0))

        # two specular-ish children
        refl = d - 2.0 * jnp.sum(d * nrm, -1)[..., None] * nrm
        kids = []
        for branch, nd in enumerate((refl, -refl)):
            ok = valid & (jnp.sum(nd * nrm, -1) * (1 - 2 * branch) > 0)
            kids.append(dict(
                o=p + 1e-3 * nd, d=nd,
                beta=jnp.where(ok[..., None], queue["beta"] * 0.9, 0.0),
                slot=queue["slot"], active=ok,
            ))
        allc = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *kids)
        order = jnp.argsort(~allc["active"], stable=True)[:cap]
        queue = jax.tree.map(lambda x: x[order], allc)
        return l_buf, queue

    l_buf0 = jnp.zeros((n, 3), F32)
    l_buf, _ = jax.lax.fori_loop(1, DEPTH + 1, body, (l_buf0, queue))
    return l_buf


# --------------------------------------------------------------------------
# PLANAR variant (component [N] arrays; row-matrix compaction)
# --------------------------------------------------------------------------
def planar_li(o, d, key):
    n = o.shape[0]
    cap = n
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    q = dict(
        ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
        br=jnp.ones((n,), F32), bg=jnp.ones((n,), F32),
        bb=jnp.ones((n,), F32),
        slot=jnp.arange(n, dtype=jnp.int32),
        active=jnp.ones((n,), bool),
    )

    def intersect(ox, oy, oz, dx, dy, dz):
        tb = jnp.full((ox.shape[0],), jnp.inf, F32)
        idx = jnp.zeros((ox.shape[0],), jnp.int32)
        for s in range(S):
            cx, cy, cz = float(C[s, 0]), float(C[s, 1]), float(C[s, 2])
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
            c = ocx * ocx + ocy * ocy + ocz * ocz - float(R[s]) ** 2
            disc = b * b - 4.0 * c
            ok = disc >= 0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t0 = 0.5 * (-b - sq)
            t1 = 0.5 * (-b + sq)
            t = jnp.where(t0 > 1e-3, t0, t1)
            t = jnp.where(ok & (t > 1e-3), t, jnp.inf)
            better = t < tb
            tb = jnp.where(better, t, tb)
            idx = jnp.where(better, s, idx)
        return jnp.isfinite(tb), tb, idx

    def body(depth, carry):
        l_r, l_g, l_b, q = carry
        ox, oy, oz = q["ox"], q["oy"], q["oz"]
        dx, dy, dz = q["dx"], q["dy"], q["dz"]
        hit, t, idx = intersect(ox, oy, oz, dx, dy, dz)
        valid = q["active"] & hit
        px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz
        # center gather: tiny [S] tables -> one-hot sums (S static, 8)
        cx = cy = cz = ar = ag = ab = 0.0
        for s in range(S):
            w = (idx == s).astype(F32)
            cx = cx + w * float(C[s, 0]); cy = cy + w * float(C[s, 1])
            cz = cz + w * float(C[s, 2])
            ar = ar + w * float(ALB[s, 0]); ag = ag + w * float(ALB[s, 1])
            ab = ab + w * float(ALB[s, 2])
        nx, ny, nz = px - cx, py - cy, pz - cz
        inv = 1.0 / jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-9)
        nx, ny, nz = nx * inv, ny * inv, nz * inv
        wx, wy, wz = LP[0] - px, LP[1] - py, LP[2] - pz
        inv = 1.0 / jnp.maximum(jnp.sqrt(wx * wx + wy * wy + wz * wz), 1e-9)
        wx, wy, wz = wx * inv, wy * inv, wz * inv
        sh, _, _ = intersect(px + 1e-3 * wx, py + 1e-3 * wy, pz + 1e-3 * wz,
                             wx, wy, wz)
        vis = (~sh).astype(F32)
        cosw = jnp.maximum(nx * wx + ny * wy + nz * wz, 0.0) * vis
        vm = valid.astype(F32)
        cr = q["br"] * ar * cosw * vm
        cg = q["bg"] * ag * cosw * vm
        cb = q["bb"] * ab * cosw * vm
        lc = jnp.stack([cr, cg, cb], axis=0)  # [3, N] -> transpose once
        l_rgb = jnp.moveaxis(lc, 0, -1)       # [N, 3] for one scatter-add
        lbuf = jnp.moveaxis(jnp.stack([l_r, l_g, l_b], 0), 0, -1)
        lbuf = lbuf.at[q["slot"]].add(l_rgb)
        lt = jnp.moveaxis(lbuf, -1, 0)
        l_r, l_g, l_b = lt[0], lt[1], lt[2]

        dn = dx * nx + dy * ny + dz * nz
        rx, ry, rz = dx - 2 * dn * nx, dy - 2 * dn * ny, dz - 2 * dn * nz
        # children x2, concat, row-matrix compaction
        fields = []
        for branch, sgn in enumerate((1.0, -1.0)):
            ex, ey, ez = sgn * rx, sgn * ry, sgn * rz
            ok = valid & ((ex * nx + ey * ny + ez * nz) * (1 - 2 * branch) > 0)
            okf = ok.astype(F32)
            fields.append(dict(
                ox=px + 1e-3 * ex, oy=py + 1e-3 * ey, oz=pz + 1e-3 * ez,
                dx=ex, dy=ey, dz=ez,
                br=q["br"] * 0.9 * okf, bg=q["bg"] * 0.9 * okf,
                bb=q["bb"] * 0.9 * okf,
                slot=q["slot"], active=ok,
            ))
        allc = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *fields)
        order = jnp.argsort(~allc["active"], stable=True)[:cap]
        # row-matrix gather: pack all state into [2N, F] f32, gather rows
        keys_ = ["ox", "oy", "oz", "dx", "dy", "dz", "br", "bg", "bb"]
        mat = jnp.stack([allc[k] for k in keys_]
                        + [jax.lax.bitcast_convert_type(allc["slot"], F32),
                           allc["active"].astype(F32)], axis=0)  # [F, 2N]
        matg = jnp.moveaxis(mat, 0, -1)[order]                    # [cap, F]
        matt = jnp.moveaxis(matg, -1, 0)                          # [F, cap]
        q = {k: matt[i] for i, k in enumerate(keys_)}
        q["slot"] = jax.lax.bitcast_convert_type(matt[9], jnp.int32)
        q["active"] = matt[10] > 0.5
        return l_r, l_g, l_b, q

    z = jnp.zeros((n,), F32)
    l_r, l_g, l_b, _ = jax.lax.fori_loop(
        1, DEPTH + 1, body, (z, z, z, q))
    return l_r + l_g + l_b


# --------------------------------------------------------------------------
# Compaction-style isolation (131072 -> 65536, 11 f32-equivalent fields)
# --------------------------------------------------------------------------
def compact_probes(out, emit):
    n2 = 2 * N
    key = jax.random.key(0)
    tree = {
        **{f"v{i}": jax.random.normal(jax.random.key(i), (n2,), F32)
           for i in range(9)},
        "slot": jnp.arange(n2, dtype=jnp.int32),
        "active": jax.random.uniform(jax.random.key(99), (n2,)) < 0.4,
    }
    tree3 = {  # packed form: 3 [2N,3] + slot + active
        "a": jax.random.normal(jax.random.key(11), (n2, 3), F32),
        "b": jax.random.normal(jax.random.key(12), (n2, 3), F32),
        "c": jax.random.normal(jax.random.key(13), (n2, 3), F32),
        "slot": jnp.arange(n2, dtype=jnp.int32),
        "active": jax.random.uniform(jax.random.key(99), (n2,)) < 0.4,
    }

    def timed(step, state):
        def loop(k, s):
            return jax.lax.fori_loop(0, k, lambda i, c: step(c), s)
        jl = jax.jit(loop)

        def run_k(k):
            t0 = time.perf_counter()
            o = jl(jnp.int32(k), state)
            _force(o)
            return time.perf_counter() - t0
        return diff_time(run_k, 8, 64)

    def step_packed(tr):
        order = jnp.argsort(~tr["active"], stable=True)
        g = jax.tree.map(lambda x: x[order], tr)
        g["a"] = g["a"] + 1e-9
        g["active"] = g["active"] ^ (g["a"][:, 0] > 1e30)
        return g

    def step_rowmat(tr):
        order = jnp.argsort(~tr["active"], stable=True)
        ks = [f"v{i}" for i in range(9)]
        mat = jnp.stack([tr[k] for k in ks]
                        + [jax.lax.bitcast_convert_type(tr["slot"], F32),
                           tr["active"].astype(F32)], axis=0)
        matg = jnp.moveaxis(mat, 0, -1)[order]
        matt = jnp.moveaxis(matg, -1, 0)
        g = {k: matt[i] + 1e-9 for i, k in enumerate(ks)}
        g["slot"] = jax.lax.bitcast_convert_type(matt[9], jnp.int32)
        g["active"] = (matt[10] > 0.5) ^ (g["v0"] > 1e30)
        return g

    def step_1d(tr):
        order = jnp.argsort(~tr["active"], stable=True)
        g = jax.tree.map(lambda x: x[order], tr)
        g["v0"] = g["v0"] + 1e-9
        g["active"] = g["active"] ^ (g["v0"] > 1e30)
        return g

    out["compact_packed3_ms"] = round(timed(step_packed, tree3) * 1e3, 3)
    emit()
    out["compact_rowmat_ms"] = round(timed(step_rowmat, tree) * 1e3, 3)
    emit()
    out["compact_1d_ms"] = round(timed(step_1d, tree) * 1e3, 3)
    emit()


def main():
    out = {}

    def emit():
        print(json.dumps(out), flush=True)

    o = np.zeros((N, 3), np.float32)
    o[:, 2] = -10.0
    ang = np.linspace(-0.4, 0.4, N).astype(np.float32)
    d = np.stack([np.sin(ang), 0.1 * np.cos(7 * ang), np.cos(ang)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    def timed_li(li_fn):
        def loop(k, carry):
            def it(i, c):
                acc, s = c
                lv = li_fn(o + s, d, None)
                return (acc, jnp.sum(lv) * jnp.float32(1e-30))
            return jax.lax.fori_loop(0, k, it, carry)
        jl = jax.jit(loop)

        def run_k(k):
            t0 = time.perf_counter()
            r = jl(jnp.int32(k), (jnp.float32(0.0), jnp.float32(0.0)))
            _force(r)
            return time.perf_counter() - t0
        return diff_time(run_k, 2, 10)

    out["mini_li_packed_ms"] = round(timed_li(packed_li) * 1e3, 3)
    emit()
    out["mini_li_planar_ms"] = round(timed_li(planar_li) * 1e3, 3)
    emit()
    compact_probes(out, emit)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
