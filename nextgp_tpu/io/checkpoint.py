"""Checkpoint / exact resume of the Gibbs chain.

The reference has no resume path (a crashed run is re-run from scratch;
SURVEY.md §5). Here the full ModelState pytree — including `sweep_index`,
from which every random draw is re-derived — serializes to one .npz, so a
restored chain continues bit-identically: keys are counter-based
(engine/rng.py), no RNG state needs saving beyond the chain seed.
"""
from __future__ import annotations

import io
import os
from typing import Any

import jax
import numpy as np


def _flatten(state):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_checkpoint(path: str, state: Any):
    """Write the state pytree to `path` (.npz). Atomic via temp+rename."""
    leaves, _ = _flatten(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Any):
    """Restore into the structure (and dtypes/shardings) of `template`."""
    with np.load(path) as data:
        leaves, treedef = _flatten(template)
        if len(leaves) != len(data.files):
            raise ValueError(
                f"checkpoint has {len(data.files)} leaves, model has {len(leaves)}"
            )
        new_leaves = []
        for i, tmpl in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            if tuple(arr.shape) != tuple(np.shape(tmpl)):
                raise ValueError(f"leaf {i}: shape {arr.shape} != {np.shape(tmpl)}")
            new_leaves.append(
                jax.device_put(arr.astype(np.asarray(tmpl).dtype), getattr(tmpl, "sharding", None))
            )
        return jax.tree_util.tree_unflatten(treedef, new_leaves)
