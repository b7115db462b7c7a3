"""Structured per-pass render statistics.

The reference's only observability is ProgressMeter bars
(/root/reference/src/Trace.jl:39-44, integrators/sampler.jl:21) — SURVEY.md
§5 calls for structured per-pass stats instead: rays traced, photons
stored, photon->visible-point pair counts, wall-clock per pass. Counters
are host-side and cheap; integrators update them with statically-known
lane counts plus the few scalars they already sync (e.g. the SPPM pair
total).
"""
from __future__ import annotations

import time


class RenderStats:
    def __init__(self):
        self.counters: dict[str, float] = {}
        self._timers: dict[str, float] = {}

    def add(self, name: str, value) -> None:
        self.counters[name] = self.counters.get(name, 0) + float(value)

    def start(self, name: str) -> None:
        self._timers[name] = time.perf_counter()

    def stop(self, name: str) -> None:
        if name in self._timers:
            self.add(f"{name}_seconds", time.perf_counter() - self._timers.pop(name))

    def mrays_per_sec(self, rays_key: str = "rays_dispatched",
                      time_key: str = "render_seconds") -> float:
        t = self.counters.get(time_key, 0.0)
        return self.counters.get(rays_key, 0.0) / t / 1e6 if t else 0.0

    def as_dict(self) -> dict:
        return dict(self.counters)

    def __repr__(self):
        rows = ", ".join(f"{k}={v:.6g}" for k, v in sorted(self.counters.items()))
        return f"RenderStats({rows})"


class trace_profile:
    """Perfetto/XLA profiler capture around a render (SURVEY §5's
    "JAX profiler traces" plan): every jit dispatch, compile, and (on
    TPU) device op inside the block lands in a trace viewable at
    ui.perfetto.dev or TensorBoard.

        with trace_profile("/tmp/trace"):
            integ.render(scene)

    Thin by design — jax.profiler.trace does the work; this wrapper only
    adds the block-until-ready barrier a correct capture needs (pending
    async dispatches would otherwise fall outside the trace window).
    """

    def __init__(self, log_dir: str, *barrier_args):
        self.log_dir = log_dir
        self.barrier_args = barrier_args

    def __enter__(self):
        import jax

        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, exc_type, exc, tb):
        import jax

        if exc_type is None:
            for a in self.barrier_args:
                jax.block_until_ready(a)
            # Also flush anything still in flight from the block body.
            jax.effects_barrier()
        jax.profiler.stop_trace()
        return False
