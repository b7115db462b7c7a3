"""Isolate the config-4 TPU fault: Pallas sparse sweep at 1M triangles.

BENCH_r04 lost config 4 to a TPU worker kernel fault (BASELINE.md:51).
This repro drives ONLY the sweep accelerator (no integrator, no film)
at the faulting scale, one knob at a time, each stage flushed before
the next so the crashing stage is identified by the last line printed.

Usage: python scripts/repro_sweep_fault.py [stage]
  stage 0: tiny chunk (4096 rays), pipelined kernel (default config)
  stage 1: full 16384-ray chunk, pipelined
  stage 2: 65536 rays -> 4 chunks, pipelined
  stage 3: same as 1 but pipeline=False
  stage 4: same as 1 but certified epilogue
  stage 5: bounce-style incoherent rays, pipelined
No arg: all stages in-process, in order.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-axon")


def log(*a):
    print(*a, flush=True)


def rays(n, seed=7, coherent=True):
    rng = np.random.default_rng(seed)
    if coherent:
        o = np.tile(np.array([[0.0, 6.0, 12.0]], np.float32), (n, 1))
        tgt = np.stack([rng.uniform(-10, 10, n), rng.uniform(0, 2, n),
                        rng.uniform(-10, 10, n)], -1).astype(np.float32)
    else:
        o = np.stack([rng.uniform(-10, 10, n), rng.uniform(3, 7, n),
                      rng.uniform(-10, 10, n)], -1).astype(np.float32)
        tgt = np.stack([rng.uniform(-10, 10, n), rng.uniform(0, 2, n),
                        rng.uniform(-10, 10, n)], -1).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (jnp.asarray(o), jnp.asarray(d),
            jnp.full((n,), jnp.inf, jnp.float32))


def main():
    stage = int(sys.argv[1]) if len(sys.argv) > 1 else -1
    from trace_tpu.models.mesh_heavy import build_scene

    log("building 1M-tri scene (host SAH/cluster build)...")
    scene = build_scene()
    acc = scene.accel
    log("scene built:", scene.n_triangles, "tris; accel",
        type(acc).__name__, "block_rays", getattr(acc, "block_rays", "?"),
        "ray_chunk", getattr(acc, "ray_chunk", "?"),
        "pipeline", getattr(acc, "pipeline", "?"))

    def run(tag, n, coherent=True, **attr):
        o, d, t = rays(n, coherent=coherent)
        saved = {k: getattr(acc, k) for k in attr}
        for k, v in attr.items():
            setattr(acc, k, v)
        try:
            (hs, ts_, _), (h, tt, ii) = acc.closest(scene, o, d, t)
            h = np.asarray(h)
            log(f"stage {tag}: OK — tri hits {int(h.sum())}/{n}",
                f"sph hits {int(np.asarray(hs).sum())}",
                f"t[0:3]={np.asarray(tt)[:3]}")
        finally:
            for k, v in saved.items():
                setattr(acc, k, v)

    stages = {
        0: lambda: run("0 tiny-chunk-4096", 4096),
        1: lambda: run("1 chunk-16384", 16384),
        2: lambda: run("2 rays-65536", 65536),
        3: lambda: run("3 no-pipeline", 16384, pipeline=False),
        4: lambda: run("4 certified", 16384, certified=True),
        5: lambda: run("5 incoherent", 16384, coherent=False),
    }
    if stage >= 0:
        stages[stage]()
    else:
        for k in sorted(stages):
            stages[k]()
    log("done")


if __name__ == "__main__":
    main()
