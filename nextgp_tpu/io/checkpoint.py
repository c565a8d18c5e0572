"""Checkpoint / exact resume of the Gibbs chain.

The reference has no resume path (a crashed run is re-run from scratch;
SURVEY.md §5). Here the full ModelState pytree — including `sweep_index`,
from which every random draw is re-derived — serializes to one .npz, so a
restored chain continues bit-identically: keys are counter-based
(engine/rng.py), no RNG state needs saving beyond the chain seed.

A checkpoint additionally records a JSON `meta` blob: the SweepPlan
fingerprint (so a checkpoint from a *different* model with coincidentally
matching shapes is rejected at load) and the kept-row count (so resume can
truncate the output TSVs back to the checkpointed row, preventing
duplicated draws from double-weighting posterior means).
"""
from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

_META_KEY = "__meta__"


def plan_fingerprint(plan: Any) -> str:
    """Stable digest of the static SweepPlan (frozen dataclasses repr)."""
    return hashlib.sha256(repr(plan).encode()).hexdigest()[:16]


def _flatten(state):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_checkpoint(path: str, state: Any, meta: Optional[Dict[str, Any]] = None):
    """Write the state pytree (+ JSON meta) to `path` (.npz). Atomic via
    temp+rename."""
    leaves, _ = _flatten(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    if meta:
        blob = json.dumps(meta).encode()
        arrays[_META_KEY] = np.frombuffer(blob, np.uint8).copy()
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
        fh.flush()
        os.fsync(fh.fileno())  # rename-before-data on power loss would
    os.replace(tmp, path)      # destroy BOTH checkpoints otherwise
    try:  # persist the rename itself
        dfd = os.open(os.path.dirname(os.path.abspath(path)) or ".", os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass


def read_meta(path: str) -> Dict[str, Any]:
    """The JSON meta blob stored with the checkpoint ({} for old files)."""
    with np.load(path) as data:
        if _META_KEY in data.files:
            return json.loads(bytes(data[_META_KEY]).decode())
    return {}


def load_checkpoint(path: str, template: Any, fingerprint: Optional[str] = None):
    """Restore into the structure (and dtypes/shardings) of `template`.

    fingerprint: when given and the checkpoint recorded one, they must
    match — a same-shaped checkpoint from a different model is an error,
    not a silent resume.
    """
    with np.load(path) as data:
        if fingerprint is not None and _META_KEY in data.files:
            meta = json.loads(bytes(data[_META_KEY]).decode())
            stored = meta.get("fingerprint")
            if stored is not None and stored != fingerprint:
                raise ValueError(
                    f"checkpoint at {path!r} was written by a different model "
                    f"(plan fingerprint {stored} != {fingerprint})"
                )
        leaf_names = [f for f in data.files if f.startswith("leaf_")]
        leaves, treedef = _flatten(template)
        if len(leaves) != len(leaf_names):
            raise ValueError(
                f"checkpoint has {len(leaf_names)} leaves, model has {len(leaves)}"
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
