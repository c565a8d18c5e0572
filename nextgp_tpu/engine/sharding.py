"""Shard context threaded through the samplers.

One implementation serves both the single-device and the sharded sweep
(SURVEY.md §2.6 "TP" row): marker columns are sharded block-wise across the
`shards` mesh axis, the residual is replicated, and per-block corrections
are merged with `psum`. The context tells the samplers where the psum
points are and how to slice the globally-generated random streams so a
chain is bit-identical however many shards execute it (for the
shape-independent streams; see markers.py for the one exception).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
from jax import lax


@dataclasses.dataclass(frozen=True)
class ShardCtx:
    axis: Optional[str] = None  # mesh axis name for the marker shard psum
    index: Any = 0  # this device's shard index (traced under shard_map)
    n_shards: int = 1

    def psum(self, x):
        if self.axis is None:
            return x
        return lax.psum(x, self.axis)

    def slice_p(self, arr, p_local):
        """Slice this shard's run of a globally-generated per-locus array."""
        if self.axis is None:
            return arr
        return lax.dynamic_slice_in_dim(arr, self.index * p_local, p_local, 0)


UNSHARDED = ShardCtx()
