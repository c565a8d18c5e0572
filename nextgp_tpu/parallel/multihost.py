"""Multi-host startup and chain-redundancy helpers.

The reference is a single Julia process (SURVEY.md §2.6: no distributed
backend of any kind). Here multi-host runs use JAX's standard bootstrap:
every host calls `init_distributed()`, builds the same global mesh over
`jax.devices()` (ICI within a slice, DCN across hosts — XLA picks the
fabric per collective), and the sharded sweep's psum/all_gather compile to
the right collectives with no further code changes.

Not exercisable in CI (single host); the multi-chip schedule itself is
validated on the virtual CPU mesh (tests/test_sharded.py) and by the
driver's dryrun_multichip.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or cloud TPU
    auto-detection when all args are None). Returns True if a multi-process
    runtime was initialized, False for single-process runs."""
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        try:  # cloud TPU metadata autodetection
            jax.distributed.initialize()
        except Exception:
            return False
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(n_chains: int = 1, n_shards: Optional[int] = None):
    """A (chains, shards) mesh over ALL processes' devices. Chains ride the
    outer (DCN-friendly) axis; marker-shard psums stay intra-slice on ICI
    whenever n_shards <= devices-per-host."""
    from .sharded import make_mesh

    return make_mesh(n_chains, n_shards, devices=jax.devices())


def chain_checksum(state) -> float:
    """Deterministic scalar fingerprint of a chain state, for cross-host
    divergence detection (same seed + same sweep -> identical checksum on
    every host; SURVEY.md §4.6)."""
    leaves = jax.tree_util.tree_leaves(state)
    acc = 0.0
    for leaf in leaves:
        a = np.asarray(leaf, dtype=np.float64)
        if a.size:
            acc = float(np.sum(np.abs(a)) + acc * 1.000000119)
    return acc
