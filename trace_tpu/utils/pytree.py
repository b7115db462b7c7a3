"""Pytree dataclass helper.

All runtime data records in trace_tpu (rays, hit records, BSDF lobe tables,
film state, ...) are frozen dataclasses registered as JAX pytrees, so they can
flow through jit/vmap/shard_map unchanged. Fields named in ``static`` are
treated as metadata (hashable, trigger recompilation when changed).
"""
from __future__ import annotations

import dataclasses

import jax


def pytree(cls=None, *, static: tuple = ()):
    """Decorator: frozen dataclass registered as a JAX pytree node."""

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        names = [f.name for f in dataclasses.fields(c)]
        data = [n for n in names if n not in static]
        return jax.tree_util.register_dataclass(
            c, data_fields=data, meta_fields=list(static)
        )

    if cls is None:
        return wrap
    return wrap(cls)


def replace(obj, **kwargs):
    """dataclasses.replace that works on pytree dataclasses."""
    return dataclasses.replace(obj, **kwargs)


def read_host(x):
    """Robust device->host readback.

    A direct ``np.asarray`` on a TPU-relay array can hang indefinitely in
    processes holding large device state (observed on v5e via the axon
    tunnel: a 4-byte readback never returned after a 1024^2 SPPM run,
    while routing the same array through the CPU backend completed in the
    usual ~90 s first-transfer setup). Transfer to the CPU device first,
    then view as numpy. No-op overhead on the CPU platform.
    """
    import numpy as np
    import jax

    try:
        cpu = jax.devices("cpu")[0]
        x = jax.device_put(x, cpu)
        jax.block_until_ready(x)
    except Exception:
        pass
    return np.asarray(x)
