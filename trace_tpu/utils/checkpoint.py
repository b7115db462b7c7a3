"""Checkpoint / resume for integrator state.

The reference only writes progressive PNGs (sppm.jl:167-171) and cannot
resume — radius/tau/N are lost (SURVEY.md §5). Here any pytree (SPPMState,
FilmState) serializes to one .npz; SPPMIntegrator.render accepts
(state, start_iteration) to continue a run bit-exactly.
"""
from __future__ import annotations

import numpy as np
import jax


def save_pytree(path: str, tree, metadata: dict | None = None) -> None:
    leaves, _ = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    if metadata:
        for k, v in metadata.items():
            arrays[f"meta_{k}"] = np.asarray(v)
    np.savez(path, **arrays)


def load_pytree(path: str, like):
    """Load leaves saved by save_pytree back into the structure of `like`."""
    import jax.numpy as jnp

    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    loaded = []
    for i, ref in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        assert arr.shape == ref.shape, (
            f"leaf {i}: checkpoint shape {arr.shape} != expected {ref.shape}"
        )
        loaded.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, loaded)


def load_metadata(path: str) -> dict:
    data = np.load(path)
    return {
        k[len("meta_"):]: data[k] for k in data.files if k.startswith("meta_")
    }
