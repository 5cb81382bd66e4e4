"""Checkpoint/resume for solver and simulation state.

The reference persists nothing (SURVEY.md section 5: the only cross-step
state is the warm start ``u_prev`` and adaptive estimates, both lost on
restart).  Here any framework pytree — MPPI solver state, closed-loop
state, controller adaptation — serializes to a single ``.npz`` with its
treedef recorded, so long experiments resume exactly (including the PRNG
key, so resumed noise streams continue deterministically).

Plain NumPy + JSON; no orbax dependency for these tiny states.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


def _key_to_data(leaf):
    if jax.dtypes.issubdtype(getattr(leaf, "dtype", None), jax.dtypes.prng_key):
        return np.asarray(jax.random.key_data(leaf)), True
    return np.asarray(leaf), False


def save(path: str, pytree: Any) -> None:
    """Save a pytree of arrays (PRNG keys included) to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(pytree)
    arrays = {}
    key_flags = []
    for i, leaf in enumerate(leaves):
        arr, is_key = _key_to_data(leaf)
        arrays[f"leaf_{i}"] = arr
        key_flags.append(is_key)
    meta = json.dumps({"treedef": str(treedef), "n": len(leaves), "keys": key_flags})
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, __meta__=np.frombuffer(meta.encode(), dtype=np.uint8), **arrays)


def restore(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save`, shaped like ``like``.

    ``like`` provides the tree structure and dtypes (the canonical way to
    resume: build a fresh initial state, then overwrite it from disk).
    """
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    leaves_like, treedef = jax.tree.flatten(like)
    if meta["n"] != len(leaves_like):
        raise ValueError(
            f"checkpoint has {meta['n']} leaves, target tree has {len(leaves_like)}"
        )
    out = []
    for i, ref in enumerate(leaves_like):
        arr = data[f"leaf_{i}"]
        if meta["keys"][i]:
            out.append(jax.random.wrap_key_data(jnp.asarray(arr)))
        else:
            out.append(jnp.asarray(arr, getattr(ref, "dtype", None)))
    return jax.tree.unflatten(treedef, out)
