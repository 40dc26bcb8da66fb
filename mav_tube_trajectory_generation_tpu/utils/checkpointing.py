"""Pytree checkpointing for long batch runs (SURVEY.md section 5.4).

The reference has no checkpoint/resume at all; for pod-scale batch sweeps we
persist solver state (d_free, times, duals, optimizer state -- any pytree of
arrays) as npz with a json-encoded treedef, so a preempted run resumes
exactly.  Uses flat npz rather than orbax to stay dependency-light; the
format is stable and host-portable.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


def save_pytree(path: str, tree: Any) -> None:
    """Save an arbitrary pytree of arrays/scalars to one npz file."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_pytree(path: str, like: Any) -> Any:
    """Load a pytree saved by save_pytree; ``like`` supplies the structure
    (its treedef must match what was saved)."""
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    with np.load(path) as data:
        n = len([k for k in data.files if k.startswith("leaf_")])
        if n != len(leaves_like):
            raise ValueError(
                f"Checkpoint has {n} leaves; template has {len(leaves_like)}.")
        if "__treedef__" in data.files:
            saved = json.loads(bytes(data["__treedef__"]).decode())
            if saved != str(treedef):
                raise ValueError(
                    "Checkpoint treedef does not match the template:\n"
                    f"  saved:    {saved}\n  template: {treedef}")
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
