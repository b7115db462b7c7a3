"""Attribution microbench for the Whitted wavefront's per-level cost.

Times each candidate hot op at the EXACT shapes of bench config 1
(shadows scene, 256^2, 65536-lane chunk, spp 4, depth 5) with the same
k-differenced forced-readback methodology as bench.py, so the numbers
compose with the recorded per-frame time. Run on the TPU relay:

    python scripts/micro_whitted.py

Prints one JSON line per probe. Used to decide the round-4 hot-path
work (VERDICT r3: the honest 499 ms/frame vs the ~11 ms relay-stream
wall); results are recorded in ARCHITECTURE.md §7.
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

N = 65536        # queue capacity (chunk lanes)
NC = 2 * N       # child queue


def _force(x):
    return np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[0])


def diff_time(run_k, k_lo, k_hi, reps=3):
    run_k(k_lo)
    ds = [(run_k(k_hi) - run_k(k_lo)) / (k_hi - k_lo) for _ in range(reps)]
    return float(np.median(ds))


def timed_loop(step, state0, k_lo=2, k_hi=10, reps=3):
    """k-differenced device time of ``step(state) -> state`` chained in
    one jit with a forced readback."""
    def loop(k, s):
        return jax.lax.fori_loop(0, k, lambda i, c: step(c), s)

    jl = jax.jit(loop)

    def run_k(k):
        t0 = time.perf_counter()
        out = jl(jnp.int32(k), state0)
        _force(out)
        return time.perf_counter() - t0

    return diff_time(run_k, k_lo, k_hi, reps)


def emit(out):
    print(json.dumps(out), flush=True)


def main():
    out = {}
    key = jax.random.key(0)

    # --- 0. loop-iteration floor: a trivial in-jit fori_loop body.
    # Discriminates "device executes loops natively" (~us/iter) from
    # "the relay pays a host round trip per loop iteration" (~ms/iter).
    x8 = jnp.full((8,), 1.5, jnp.float32)

    def loop8(k, v):
        return jax.lax.fori_loop(0, k, lambda i, u: jnp.sin(u) + 1e-6, v)

    jl8 = jax.jit(loop8)
    _force(jl8(jnp.int32(8), x8))

    def run8(k):
        t0 = time.perf_counter()
        out_ = jl8(jnp.int32(k), x8)
        _force(out_)
        return time.perf_counter() - t0

    out["loop_iter_us"] = round(
        diff_time(run8, 64, 4096) / (1) * 1e6, 3)
    emit(out)

    # Same, but a 262144x3 elementwise body (HBM-bound vector op).
    xb = jnp.ones((262144, 3), jnp.float32)

    def loopb(k, v):
        return jax.lax.fori_loop(
            0, k, lambda i, u: u * 1.000001 + 1e-12, v)

    jlb = jax.jit(loopb)
    _force(jlb(jnp.int32(4), xb))

    def runb(k):
        t0 = time.perf_counter()
        out_ = jlb(jnp.int32(k), xb)
        _force(out_)
        return time.perf_counter() - t0

    out["vec_iter_us"] = round(diff_time(runb, 16, 256) * 1e6, 3)
    emit(out)
    # Representative child queue: ~35% live, duplicate slots, a 20-leaf
    # pytree like the whitted queue (rd origins/dirs/diffs + beta + ids).
    k1, k2, k3 = jax.random.split(key, 3)
    active = jax.random.uniform(k1, (NC,)) < 0.35
    slot = jax.random.randint(k2, (NC,), 0, N, jnp.int32)
    tree = {f"f{i}": jax.random.normal(k3, (NC, 3)) for i in range(6)}
    tree["slot"] = slot
    tree["active"] = active
    tree["beta"] = jax.random.normal(k3, (NC, 3))

    # --- 1. compaction: argsort vs partition, full-queue gather ---
    def compact_argsort(q):
        order = jnp.argsort(~q["active"], stable=True)[:N]
        return jax.tree.map(lambda x: x[order], q)

    def compact_partition(q):
        a = q["active"]
        cum = jnp.cumsum(a.astype(jnp.int32))
        n_act = cum[-1]
        j = jnp.arange(N, dtype=jnp.int32)
        idx_live = jnp.searchsorted(cum, j + 1, side="left")
        cum_dead = jnp.arange(1, NC + 1, dtype=jnp.int32) - cum
        idx_dead = jnp.searchsorted(cum_dead, j + 1 - n_act, side="left")
        order = jnp.clip(jnp.where(j < n_act, idx_live, idx_dead),
                         0, NC - 1).astype(jnp.int32)
        return jax.tree.map(lambda x: x[order], q)

    def step_with(compact):
        def step(q):
            qc = compact(q)
            # re-expand to NC so the loop state has a fixed shape, with a
            # data dependency on the compacted queue
            return jax.tree.map(
                lambda c, f: jnp.concatenate([c, c], 0).astype(f.dtype)
                if c.ndim else f, qc, q)
        return step

    out["compact_argsort_ms"] = round(
        timed_loop(step_with(compact_argsort), tree) * 1e3, 3)
    out["compact_partition_ms"] = round(
        timed_loop(step_with(compact_partition), tree) * 1e3, 3)
    emit(out)

    # --- 2. scatter-add with duplicate indices (l_buf.at[slot].add) ---
    l_buf = jnp.zeros((N, 3), jnp.float32)
    contrib = jax.random.normal(k3, (N, 3))
    slot_n = jax.random.randint(k2, (N,), 0, N, jnp.int32)

    def step_scatter(buf):
        return buf.at[slot_n].add(contrib + buf[0, 0])

    out["scatter_add_dup_ms"] = round(
        timed_loop(step_scatter, l_buf) * 1e3, 3)

    # sorted-unique variant (film-like best case)
    slot_u = jnp.arange(N, dtype=jnp.int32)

    def step_scatter_u(buf):
        return buf.at[slot_u].add(contrib + buf[0, 0],
                                  unique_indices=True,
                                  indices_are_sorted=True)

    out["scatter_add_unique_sorted_ms"] = round(
        timed_loop(step_scatter_u, l_buf) * 1e3, 3)
    emit(out)

    # --- 3. one full whitted level (li body) on the shadows scene ---
    from trace_tpu.models.spheres import build_scene, build_camera
    from trace_tpu.integrators.whitted import li
    from trace_tpu.sampler.uniform import get_camera_samples

    scene = build_scene()
    camera = build_camera(resolution=256, filename="/tmp/micro.png")
    xs = np.stack([np.arange(N, dtype=np.int32) % 256,
                   np.arange(N, dtype=np.int32) // 256], -1)
    pf, ul, ut = get_camera_samples(jax.random.key(1), jnp.asarray(xs))
    rd, _ = camera.generate_ray_differentials(pf, ul, ut)

    def step_li(carry):
        r, s = carry
        o = r.o + s * 0.0
        import trace_tpu.utils.pytree as P
        r2 = P.replace(r, o=o)
        lv = li(scene, r2, jax.random.key(2), max_depth=5)
        return (r, jnp.sum(lv) * 1e-30)

    out["li_full_frame5_ms"] = round(
        timed_loop(step_li, (rd, jnp.float32(0.0)), k_lo=1, k_hi=4) * 1e3, 3)
    emit(out)

    # --- 4. intersect-only at chunk shape ---
    def step_hit(carry):
        r, s = carry
        import trace_tpu.utils.pytree as P
        r2 = P.replace(r, o=r.o + s * 0.0)
        h = scene.intersect(r2.o, r2.d, r2.t_max, r2.time)
        return (r, jnp.sum(h.t) * 1e-30)

    out["intersect_ms"] = round(
        timed_loop(step_hit, (rd, jnp.float32(0.0))) * 1e3, 3)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
