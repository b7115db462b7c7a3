"""Benchmarks for all five BASELINE.json configs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
The primary metric stays config 1 (Whitted shadows 256², the number
tracked since round 1); ``extras`` carries every config so the driver
artifact records the full BASELINE table:

  1. whitted_shadows_256_mrays   — shadows scene, Whitted, 256², depth 5
  2. cornell_mis_512_mrays       — Cornell path tracer, area light + MIS,
                                   512², 4 spp, depth 5
  3. sppm_caustic_1024_ms_per_iter — caustic_glass SPPM, 1024², depth 8,
                                   262144 photons/iteration (warm)
  4. mesh1m_whitted_256_mrays    — 1M-triangle heightfield traversal,
                                   256², depth 2
  5. animated_relight_ms_per_frame — caustic scene, per-frame light swap
                                   (+BVH refit), 2 SPPM iters at 128²

Ray accounting (configs 1/2/4): every wavefront level traces one
closest-hit ray per queue lane plus one any-hit shadow ray per light
(config 2: one NEE shadow ray per bounce); the queue capacity equals the
pixel-sample count. The reference publishes no numbers (BASELINE.md), so
vs_baseline is against the driver's north-star target of 100 Mrays/s/chip.

Each config is independently guarded: a failure records ``null`` for that
entry (with the error class in ``extras.errors``) instead of killing the
run. Timings are medians over repeats; the primary metric also reports
its IQR so run-to-run tunnel jitter is visible in the artifact.
"""
from __future__ import annotations

import json
import os
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

# Persistent XLA compilation cache: through the remote-TPU tunnel a fresh
# compile costs minutes; cached reruns skip it entirely (verified). Keyed
# per platform profile — a cache entry AOT-compiled for one profile can
# SIGILL on another (the round-1 entry-point lesson, commit e77c513).
_profile = os.environ.get("JAX_PLATFORMS", "default").replace(",", "-")
jax.config.update("jax_compilation_cache_dir", f"/tmp/jaxcache-{_profile}")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

NORTH_STAR_MRAYS = 100.0


def _median_iqr(times):
    q1, med, q3 = np.percentile(times, [25, 50, 75])
    return float(med), float(q3 - q1)


def bench_whitted_shadows():
    """Config 1: shadows scene, Whitted, 256², depth 5."""
    from trace_tpu.models.spheres import build_scene, build_camera
    from trace_tpu.integrators.whitted import WhittedIntegrator
    from trace_tpu.sampler.uniform import UniformSampler

    res, spp, max_depth = 256, 4, 5
    scene = build_scene()
    camera = build_camera(resolution=res, filename="/tmp/bench_shadows.png")
    integ = WhittedIntegrator(
        camera, UniformSampler(spp, seed=0), max_depth=max_depth,
        pixel_chunk=1 << 17,  # whole frame in one chunk -> spp dispatches
    )

    state = integ.render(scene)  # warm-up (compile)
    jax.block_until_ready(state.xyz)

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        state = integ.render(scene)
        jax.block_until_ready(state.xyz)
        times.append(time.perf_counter() - t0)
    dt, iqr = _median_iqr(times)

    (x0, y0), (x1, y1) = camera.film.sample_bounds()
    n_pixels = (x1 - x0 + 1) * (y1 - y0 + 1)
    n_lights = int(np.asarray(scene.lights.kind).shape[0])
    total_rays = n_pixels * spp * (1 + n_lights) * max_depth
    mrays = total_rays / dt / 1e6
    return {
        "mrays": round(mrays, 3),
        "ms": round(dt * 1e3, 3),
        "iqr_ms": round(iqr * 1e3, 3),
    }


def bench_cornell_path():
    """Config 2: Cornell-style box, path tracer with area light + MIS,
    512², 4 spp, depth 5."""
    from trace_tpu.models.cornell import build_scene, build_camera
    from trace_tpu.integrators.path import PathIntegrator
    from trace_tpu.sampler.uniform import UniformSampler

    res, spp, max_depth = 512, 4, 5
    scene = build_scene()
    camera = build_camera(resolution=res, filename="/tmp/bench_cornell.png")
    integ = PathIntegrator(
        camera, UniformSampler(spp, seed=0), max_depth=max_depth,
        pixel_chunk=1 << 18,
    )

    state = integ.render(scene)
    jax.block_until_ready(state.xyz)
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        state = integ.render(scene)
        jax.block_until_ready(state.xyz)
        times.append(time.perf_counter() - t0)
    dt, _ = _median_iqr(times)

    (x0, y0), (x1, y1) = camera.film.sample_bounds()
    n_pixels = (x1 - x0 + 1) * (y1 - y0 + 1)
    # Per bounce: one scatter ray + one NEE shadow ray.
    total_rays = n_pixels * spp * max_depth * 2
    return {"mrays": round(total_rays / dt / 1e6, 3),
            "ms": round(dt * 1e3, 3)}


def bench_sppm_caustic():
    """Config 3: caustic_glass SPPM flagship — 1024², ray depth 8,
    262144 photons/iteration. Reports warm ms per full SPPM iteration
    (all five phases, device-side)."""
    from trace_tpu.models.caustic_glass import build_scene, build_camera
    from trace_tpu.integrators.sppm import SPPMIntegrator

    scene = build_scene()
    camera = build_camera(resolution=1024,
                          filename="/tmp/bench_caustic.png")
    # Default: fused_block=1 — ONE dispatch per full five-phase
    # iteration, dispatches pipelined (no host sync between blocks).
    # Validated at flagship scale (100 iterations, 1024², finite image);
    # blocks ≥2 fault the TPU runtime at this program size whether
    # looped or unrolled (see SPPMIntegrator.__init__ notes), so 1 is
    # both the safe and the fast setting. BENCH_SPPM_FUSED overrides:
    # 0 = stepwise (~10 dispatches/iteration), k>0 = block length k.
    fused_env = os.environ.get("BENCH_SPPM_FUSED")
    fused_k = int(fused_env) if fused_env is not None else 1
    integ = SPPMIntegrator(
        camera, initial_search_radius=0.075, max_depth=8,
        n_iterations=100, photons_per_iteration=1 << 18,
        fused_iterations=fused_k > 0,
        fused_block=fused_k if fused_k > 0 else 8,
    )
    n_timed = 10
    # Warm-up must compile the same dispatch shapes as the timed run:
    # the fused path's block length is a static jit arg, so a short warm
    # run would leave the timed run paying an XLA compile mid-timing.
    state = integ.render(scene,
                         n_iterations=n_timed if fused_k > 0 else 2)
    jax.block_until_ready(state.tau)

    t0 = time.perf_counter()
    state = integ.render(scene, n_iterations=n_timed)
    jax.block_until_ready(state.tau)
    dt = (time.perf_counter() - t0) / n_timed
    return {"ms_per_iter": round(dt * 1e3, 3)}


def bench_mesh_1m():
    """Config 4: ~1M-triangle heightfield — traversal at production mesh
    scale. Two workloads: the 256²/1spp latency frame, and the
    512²/4spp throughput frame (fixed per-frame costs amortize). Uses the
    scene-default accelerator (Pallas sparse sweep on TPU — the round-2
    A/B measured it 3.6-4x the XLA cluster sweep at 1M tris). Native SAH
    build time reported alongside."""
    from trace_tpu.models.mesh_heavy import build_scene, build_camera
    from trace_tpu.integrators.whitted import WhittedIntegrator
    from trace_tpu.sampler.uniform import UniformSampler

    max_depth = 2
    from trace_tpu.native import load as load_native

    load_native()  # one-time g++ compile of the native lib, if needed —
    # not part of the per-scene build cost being measured.
    tb0 = time.perf_counter()
    scene = build_scene()  # scene default: Pallas sweep on TPU
    build_s = time.perf_counter() - tb0

    def run(res, spp, reps):
        camera = build_camera(resolution=res,
                              filename="/tmp/bench_mesh1m.png")
        integ = WhittedIntegrator(
            camera, UniformSampler(spp, seed=0), max_depth=max_depth,
            pixel_chunk=1 << 18,
        )
        state = integ.render(scene)
        jax.block_until_ready(state.xyz)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            state = integ.render(scene)
            jax.block_until_ready(state.xyz)
            times.append(time.perf_counter() - t0)
        dt, _ = _median_iqr(times)
        (x0, y0), (x1, y1) = camera.film.sample_bounds()
        n_pixels = (x1 - x0 + 1) * (y1 - y0 + 1)
        n_lights = int(np.asarray(scene.lights.kind).shape[0])
        total_rays = n_pixels * spp * (1 + n_lights) * max_depth
        return dt, total_rays

    dt_lat, rays_lat = run(256, 1, 7)
    dt_thr, rays_thr = run(512, 4, 5)

    # On-device LBVH-style build at 1M tris (BASELINE config 4's
    # "on-device LBVH build" leg): Morton codes + argsort + block pack,
    # one jitted dispatch (accel/morton.py). The host SAH build above is
    # the static-scene default; this is the per-frame-rebuild capability.
    from trace_tpu.accel.morton import build_clusters_device

    tris = jax.tree.map(jnp.asarray, scene.triangles_host)
    acc = build_clusters_device(tris, 64)  # warm-up (compile)
    jax.block_until_ready(acc.packed)
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        acc = build_clusters_device(tris, 64)
        jax.block_until_ready(acc.packed)
        times.append(time.perf_counter() - t0)
    dev_build_ms, _ = _median_iqr(times)

    return {
        "mrays": round(rays_thr / dt_thr / 1e6, 3),
        "ms_512_4spp": round(dt_thr * 1e3, 3),
        "ms_256_1spp": round(dt_lat * 1e3, 3),
        "mrays_256_1spp": round(rays_lat / dt_lat / 1e6, 3),
        "n_tris": int(scene.n_triangles),
        "build_s": round(build_s, 2),
        "device_build_ms": round(dev_build_ms * 1e3, 3),
    }


def bench_animated_relight():
    """Config 5: animated caustic — per-frame light-table swap (the
    moving spot of caustic_moving.jl) + per-frame MOVED geometry through
    the animated-geometry path: the 88k-tri mesh stays device-resident
    and each frame passes only its Transform
    (render(geometry=base, geometry_transform=xf)), so the vertex
    transform + Morton re-clustering is ONE dispatch and the 2 SPPM
    iterations another (fused_iterations) — every frame reuses the
    compiled executables. 2 SPPM iterations per frame at 128²."""
    from trace_tpu.core import transform as T
    from trace_tpu.models.caustic_glass import build_scene, build_camera
    from trace_tpu.models.caustic_moving import set_frame_lights
    from trace_tpu.integrators.sppm import SPPMIntegrator

    scene = build_scene()
    camera = build_camera(resolution=128, filename="/tmp/bench_anim.png")
    integ = SPPMIntegrator(
        camera, initial_search_radius=0.055, max_depth=5, n_iterations=2,
        photons_per_iteration=1 << 16,
        fused_iterations=True, fused_block=2,
    )
    base_tris = jax.tree.map(jnp.asarray, scene.triangles_host)

    def frame(shift):
        set_frame_lights(scene, float(shift))
        xf = T.translate([0.0, 0.002 * float(shift), 0.0])
        st = integ.render(scene, n_iterations=2, geometry=base_tris,
                          geometry_transform=xf)
        jax.block_until_ready(st.tau)

    frame(0.0)  # warm-up (compile)
    times = []
    for i, shift in enumerate(np.arange(0.1, 0.8, 0.1)):
        t0 = time.perf_counter()
        frame(shift)
        times.append(time.perf_counter() - t0)
    dt, _ = _median_iqr(times)
    return {"ms_per_frame": round(dt * 1e3, 3)}


CONFIGS = [
    ("whitted_shadows_256", bench_whitted_shadows),
    ("cornell_mis_512", bench_cornell_path),
    ("sppm_caustic_1024", bench_sppm_caustic),
    ("mesh1m_whitted_256", bench_mesh_1m),
    ("animated_relight_128", bench_animated_relight),
]


def _run_configs_inline(extras, errors):
    only = os.environ.get("BENCH_ONLY")
    for name, fn in CONFIGS:
        if only and only not in name:
            continue
        try:
            extras[name] = fn()
        except Exception as e:  # record, keep going
            traceback.print_exc()
            extras[name] = None
            errors[name] = f"{type(e).__name__}: {e}"[:300]


def _relay_alive(timeout_s: int = 420) -> bool:
    """One tiny dispatch in a throwaway child. If the TPU relay is hung
    (observed failure mode: jax.devices() blocks forever), this bounds
    the whole bench at minutes instead of 5 per-config timeouts."""
    import subprocess
    import sys

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "jax.jit(jnp.sqrt)(jnp.full((8,), 2.0)).block_until_ready();"
             "print('ok')"],
            env=dict(os.environ), capture_output=True, text=True,
            timeout=timeout_s,
        )
        return proc.returncode == 0 and "ok" in proc.stdout
    except Exception:
        return False


def _run_configs_isolated(extras, errors):
    """Each config in its own child process: a TPU-runtime fault (which
    can wedge or kill the whole process, not just raise) then costs one
    config, not the artifact. Children share the persistent compile
    cache, so the only per-child overhead is tunnel setup."""
    import subprocess
    import sys

    if not _relay_alive():
        for name, _ in CONFIGS:
            extras[name] = None
        errors["relay"] = "TPU relay unresponsive (health-check dispatch timed out)"
        return
    only = os.environ.get("BENCH_ONLY")
    for name, _ in CONFIGS:
        if only and only not in name:
            continue
        env = dict(os.environ)
        env["BENCH_ONLY"] = name
        env["BENCH_INLINE"] = "1"
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=2400,
            )
            line = proc.stdout.strip().splitlines()[-1]
            child = json.loads(line)
            extras[name] = child["extras"].get(name)
            for k, v in child["extras"].get("errors", {}).items():
                errors[k] = v
        except Exception as e:
            extras[name] = None
            errors[name] = f"{type(e).__name__}: {e}"[:300]


def _axon_relay_down():
    """3-second socket probe of the axon TPU relay (127.0.0.1:8083, the
    stateless jax.devices() port). When the relay service is down, any
    JAX op on the axon backend hangs FOREVER (the client retries in a
    loop) — observed multi-hour outages — so bench must fail fast with a
    parseable artifact instead of eating the driver's whole timeout.
    Only consulted when the axon plugin would actually register."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        return False
    import socket

    s = socket.socket()
    s.settimeout(3)
    try:
        s.connect(("127.0.0.1", 8083))
        return False
    except OSError:
        return True
    finally:
        s.close()


def main():
    extras = {}
    errors = {}
    if _axon_relay_down():
        print(json.dumps({
            "metric": "bench_failed",
            "value": 0.0,
            "unit": "Mrays/s",
            "vs_baseline": 0.0,
            "extras": {"errors": {"all": "axon TPU relay down "
                                  "(127.0.0.1:8083 connection refused)"}},
        }))
        return
    if os.environ.get("BENCH_INLINE"):
        _run_configs_inline(extras, errors)
    else:
        _run_configs_isolated(extras, errors)
    if errors:
        extras["errors"] = errors

    primary = extras.get("whitted_shadows_256")
    if primary:
        out = {
            "metric": "whitted_shadows_256_mrays_per_sec",
            "value": primary["mrays"],
            "unit": "Mrays/s",
            "vs_baseline": round(primary["mrays"] / NORTH_STAR_MRAYS, 4),
            "extras": extras,
        }
    else:
        out = {
            "metric": "bench_failed",
            "value": 0.0,
            "unit": "Mrays/s",
            "vs_baseline": 0.0,
            "extras": extras,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
