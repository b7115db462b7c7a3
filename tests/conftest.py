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

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
