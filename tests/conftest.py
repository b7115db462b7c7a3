"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before JAX initializes — this conftest imports first.
Note: plain ``os.environ.setdefault``/``JAX_PLATFORMS`` is not enough in
environments whose sitecustomize registers and selects a TPU backend
(e.g. the axon relay); ``jax.config.update`` below wins regardless.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    Every XLA:CPU executable keeps JIT code pages mmapped for the life of
    the process; the full suite compiles enough of them (measured ~2.8k
    new maps/min on this box) to hit the kernel's vm.max_map_count
    ceiling (65530), at which point ORC's next code allocation segfaults
    inside backend_compile_and_load. Each module re-compiles what it
    needs; cross-module cache reuse is minor compared to crashing the
    one-process `pytest tests/` run."""
    yield
    jax.clear_caches()
