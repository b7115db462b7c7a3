"""bench.py orchestration: the driver artifact must survive per-config
failures (a TPU-runtime fault kills a child process, not the JSON line).
Runs the inline path with stubbed configs — no TPU, no real renders.
"""
import importlib.util
import json
import subprocess
import sys

import pytest


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_inline_records_errors_and_keeps_going(bench, monkeypatch):
    calls = []

    def ok():
        calls.append("ok")
        return {"mrays": 123.0, "ms": 1.0, "iqr_ms": 0.1}

    def boom():
        calls.append("boom")
        raise RuntimeError("synthetic fault")

    monkeypatch.setattr(bench, "CONFIGS", [
        ("whitted_shadows_256", ok),
        ("cornell_mis_512", boom),
        ("sppm_caustic_1024", ok),
    ])
    monkeypatch.delenv("BENCH_ONLY", raising=False)
    extras, errors = {}, {}
    bench._run_configs_inline(extras, errors)
    assert calls == ["ok", "boom", "ok"]  # the fault didn't stop the run
    assert extras["cornell_mis_512"] is None
    assert "RuntimeError" in errors["cornell_mis_512"]
    assert extras["sppm_caustic_1024"]["mrays"] == 123.0


def test_bench_only_filter(bench, monkeypatch):
    ran = []
    monkeypatch.setattr(bench, "CONFIGS", [
        ("whitted_shadows_256", lambda: ran.append("w") or {}),
        ("cornell_mis_512", lambda: ran.append("c") or {}),
    ])
    monkeypatch.setenv("BENCH_ONLY", "cornell")
    extras, errors = {}, {}
    bench._run_configs_inline(extras, errors)
    assert ran == ["c"] and not errors


def test_isolated_child_emits_parseable_json():
    # A real child invocation with every config filtered away must still
    # print exactly one JSON line on stdout (the parent parses the last
    # stdout line of each child).
    import os

    env = dict(os.environ)
    env.update(BENCH_INLINE="1", BENCH_ONLY="no_such_config",
               JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the child off the relay
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    proc = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["metric"] == "bench_failed" and out["extras"] == {}


def test_median_iqr(bench):
    med, iqr = bench._median_iqr([1.0, 2.0, 3.0, 4.0, 100.0])
    assert med == 3.0
    assert iqr == 2.0
