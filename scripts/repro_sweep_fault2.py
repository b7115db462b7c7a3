"""Config-4 fault bisect, stage 2: the accel-only repro passes at every
chunk shape, but the FULL render faults. Toggle the differences one at
a time; each stage prints before/after so the crashing stage is the
last line. Run each stage in its own process (a TPU worker crash kills
the process): python scripts/repro_sweep_fault2.py <stage>

  0: render 256²/1spp, pixel_chunk 16384 (no tail chunk in the accel)
  1: render 256²/1spp, pixel_chunk 1<<18 (bench shape: 4x16384 + 1028
     tail chunk -> 3-block pallas grid)
  2: accel-only at the tail shape: 1028 rays (pad 1536, nb=3)
  3: accel-only, two chained calls in ONE jit (closest + anyhit), 16384
  4: render 256²/1spp, pixel_chunk 1<<18, packed li (r4 code path)
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


def main():
    stage = int(sys.argv[1])
    from trace_tpu.models.mesh_heavy import build_scene, build_camera
    from trace_tpu.integrators.whitted import WhittedIntegrator
    from trace_tpu.sampler.uniform import UniformSampler

    log("building scene...")
    scene = build_scene()
    acc = scene.accel
    log("built; stage", stage)

    def render(chunk, impl):
        camera = build_camera(resolution=256, filename="/tmp/r2.png")
        integ = WhittedIntegrator(
            camera, UniformSampler(1, seed=0), max_depth=2,
            pixel_chunk=chunk, li_impl=impl)
        st = integ.render(scene)
        v = np.asarray(jnp.ravel(st.xyz)[0])
        log("render ok", float(np.asarray(st.xyz).sum()))

    if stage == 0:
        render(16384, "auto")
    elif stage == 1:
        render(1 << 18, "auto")
    elif stage == 2:
        rng = np.random.default_rng(7)
        n = 1028
        o = np.tile(np.array([[0.0, 6.0, 12.0]], np.float32), (n, 1))
        tgt = np.stack([rng.uniform(-10, 10, n), rng.uniform(0, 2, n),
                        rng.uniform(-10, 10, n)], -1).astype(np.float32)
        d = tgt - o
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        (hs, *_), (h, t, i) = acc.closest(
            scene, jnp.asarray(o), jnp.asarray(d),
            jnp.full((n,), jnp.inf, jnp.float32))
        log("tail-shape ok", int(np.asarray(h).sum()))
    elif stage == 3:
        rng = np.random.default_rng(7)
        n = 16384
        o = np.tile(np.array([[0.0, 6.0, 12.0]], np.float32), (n, 1))
        tgt = np.stack([rng.uniform(-10, 10, n), rng.uniform(0, 2, n),
                        rng.uniform(-10, 10, n)], -1).astype(np.float32)
        d = tgt - o
        d /= np.linalg.norm(d, axis=-1, keepdims=True)

        @jax.jit
        def both(o_, d_):
            t_max = jnp.full((n,), jnp.inf, jnp.float32)
            _, (h, t, i) = acc.closest(scene, o_, d_, t_max)
            occ = acc.any_hit(scene, o_ + 0.01, d_, t_max)
            return h, occ

        h, occ = both(jnp.asarray(o), jnp.asarray(d))
        log("chained ok", int(np.asarray(h).sum()),
            int(np.asarray(occ).sum()))
    elif stage == 4:
        render(1 << 18, "packed")
    elif 70 > stage >= 50:
        stage5(stage - 50)
    elif stage >= 90:
        stage7(stage - 90)
    elif stage >= 70:
        stage6(stage - 70)
    log("done")


def stage6(k):
    """split-dispatch frame timer at k frames (bench's new config-4
    path)."""
    sys.argv = [sys.argv[0]]
    from trace_tpu.models.mesh_heavy import build_scene, build_camera
    from trace_tpu.integrators.whitted import WhittedIntegrator
    from trace_tpu.sampler.uniform import UniformSampler
    import bench

    scene = build_scene()
    camera = build_camera(resolution=256, filename="/tmp/r4.png")
    integ = WhittedIntegrator(camera, UniformSampler(1, seed=0),
                              max_depth=2, pixel_chunk=1 << 18)
    run_k = bench._frame_exec_timer(integ, scene, split_dispatches=True)
    t = run_k(k)
    log(f"split-timer k={k} ok, wall {t:.2f}s")


def stage7(spp):
    """render 512^2 at given spp (the bench throughput frame)."""
    from trace_tpu.models.mesh_heavy import build_scene, build_camera
    from trace_tpu.integrators.whitted import WhittedIntegrator
    from trace_tpu.sampler.uniform import UniformSampler

    scene = build_scene()
    camera = build_camera(resolution=512, filename="/tmp/r5.png")
    integ = WhittedIntegrator(camera, UniformSampler(spp, seed=0),
                              max_depth=2, pixel_chunk=1 << 18)
    st = integ.render(scene)
    import numpy as _np, jax.numpy as _jnp
    _np.asarray(_jnp.ravel(st.xyz)[0])
    log(f"render512 spp={spp} ok")


def stage5(k):
    """The bench's k-chained-frames timer at frame count k."""
    sys.argv = [sys.argv[0]]
    from trace_tpu.models.mesh_heavy import build_scene, build_camera
    from trace_tpu.integrators.whitted import WhittedIntegrator
    from trace_tpu.sampler.uniform import UniformSampler
    import bench

    scene = build_scene()
    camera = build_camera(resolution=256, filename="/tmp/r3.png")
    integ = WhittedIntegrator(camera, UniformSampler(1, seed=0),
                              max_depth=2, pixel_chunk=1 << 18)
    run_k = bench._frame_exec_timer(integ, scene)
    t = run_k(k)
    log(f"frame-timer k={k} ok, wall {t:.2f}s")


if __name__ == "__main__":
    main()
