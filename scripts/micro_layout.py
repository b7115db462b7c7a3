"""Layout hypothesis probe: [N,3] minor-dim-3 vs unpacked component ops.

TPU vector tiles are (8,128); an op with a size-3 minor axis that XLA
cannot flatten (reductions over axis -1, [...,None] broadcasts, stacks)
runs its lanes at 3/128 occupancy. If that is the Whitted composition
gap (ARCHITECTURE 7b), chains of geometry ops should measure ~10-40x
faster unpacked (ax,ay,az as three [N] arrays) than as [N,3].
Cumulative JSON per probe.
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


def _force(x):
    return np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[0])


def diff_time(run_k, k_lo, k_hi, reps=3):
    run_k(k_lo)
    ds = [(run_k(k_hi) - run_k(k_lo)) / (k_hi - k_lo) for _ in range(reps)]
    return float(np.median(ds))


def timed_loop(step, state0, k_lo=8, k_hi=64, reps=3):
    def loop(k, s):
        return jax.lax.fori_loop(0, k, lambda i, c: step(c), s)

    jl = jax.jit(loop)

    def run_k(k):
        t0 = time.perf_counter()
        out = jl(jnp.int32(k), state0)
        _force(out)
        return time.perf_counter() - t0

    return diff_time(run_k, k_lo, k_hi, reps)


def main():
    out = {}

    def emit():
        print(json.dumps(out), flush=True)

    key = jax.random.key(0)
    a = jax.random.normal(key, (N, 3), jnp.float32)
    b = jax.random.normal(jax.random.key(1), (N, 3), jnp.float32)
    au = tuple(a[:, i] for i in range(3))
    bu = tuple(b[:, i] for i in range(3))
    mask = jax.random.uniform(jax.random.key(2), (N,)) < 0.5

    # Chain: 8 iterations of (dot -> scale -> normalize-ish -> where),
    # the shape of a typical shading epilogue.
    def chain_packed(x):
        for _ in range(8):
            d = jnp.sum(x * b, axis=-1)                      # [N]
            x = x + d[..., None] * b                          # [N,3]
            inv = jax.lax.rsqrt(jnp.sum(x * x, -1) + 1e-9)
            x = x * inv[..., None]
            x = jnp.where(mask[..., None], x, -x)
        return x

    def chain_unpacked(xs):
        x0, x1, x2 = xs
        for _ in range(8):
            d = x0 * bu[0] + x1 * bu[1] + x2 * bu[2]
            x0, x1, x2 = (x0 + d * bu[0], x1 + d * bu[1], x2 + d * bu[2])
            inv = jax.lax.rsqrt(x0 * x0 + x1 * x1 + x2 * x2 + 1e-9)
            x0, x1, x2 = x0 * inv, x1 * inv, x2 * inv
            x0 = jnp.where(mask, x0, -x0)
            x1 = jnp.where(mask, x1, -x1)
            x2 = jnp.where(mask, x2, -x2)
        return x0, x1, x2

    out["chain8_packed_us"] = round(
        timed_loop(lambda x: chain_packed(x), a) * 1e6, 2)
    emit()
    out["chain8_unpacked_us"] = round(
        timed_loop(lambda xs: chain_unpacked(xs), au) * 1e6, 2)
    emit()

    # Single ops
    def dot_packed(x):
        return x + jnp.sum(x * b, -1)[..., None]

    def dot_unpacked(xs):
        x0, x1, x2 = xs
        d = x0 * bu[0] + x1 * bu[1] + x2 * bu[2]
        return x0 + d, x1 + d, x2 + d

    out["dot_packed_us"] = round(timed_loop(dot_packed, a) * 1e6, 2)
    out["dot_unpacked_us"] = round(timed_loop(dot_unpacked, au) * 1e6, 2)
    emit()

    # cross product (the stack-heavy op)
    def cross_packed(x):
        c = jnp.cross(x, b)
        return x + c * 1e-6

    def cross_unpacked(xs):
        x0, x1, x2 = xs
        c0 = x1 * bu[2] - x2 * bu[1]
        c1 = x2 * bu[0] - x0 * bu[2]
        c2 = x0 * bu[1] - x1 * bu[0]
        return x0 + c0 * 1e-6, x1 + c1 * 1e-6, x2 + c2 * 1e-6

    out["cross_packed_us"] = round(timed_loop(cross_packed, a) * 1e6, 2)
    out["cross_unpacked_us"] = round(
        timed_loop(cross_unpacked, au) * 1e6, 2)
    emit()

    # gather of [N,3] by int index (queue compaction shape) vs 3x[N]
    idx = jax.random.randint(jax.random.key(3), (N,), 0, N, jnp.int32)

    def gather_packed(x):
        return x[idx] + 1e-9

    def gather_unpacked(xs):
        return tuple(x[idx] + 1e-9 for x in xs)

    out["gather_packed_us"] = round(timed_loop(gather_packed, a) * 1e6, 2)
    out["gather_unpacked_us"] = round(
        timed_loop(gather_unpacked, au) * 1e6, 2)
    emit()

    # threefry PRNG at lane count (the per-level draw budget: 3 folds)
    keys = jax.random.split(jax.random.key(4), N)

    def prng_step(s):
        k2 = jax.vmap(jax.random.fold_in)(keys, (s[0] * 0.0 + 1).astype(jnp.uint32) + jnp.arange(N, dtype=jnp.uint32))
        u = jax.vmap(lambda k: jax.random.uniform(k, (2,)))(k2)
        return (s[0] + jnp.sum(u) * 1e-30,)

    out["prng_fold_2d_us"] = round(
        timed_loop(prng_step, (jnp.float32(0.0),), k_lo=2, k_hi=10) * 1e6, 2)
    emit()

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
