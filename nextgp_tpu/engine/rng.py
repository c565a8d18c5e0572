"""Deterministic counter-based key derivation for the Gibbs engine.

The reference consumes Julia's global RNG in program order
(`rand(Normal(...))` etc. throughout `src/functions.jl`), which cannot be
replayed across backends. Here every draw site gets a key derived as

    fold_in(fold_in(fold_in(chain_key, sweep), STAGE), index)

so chains are bit-reproducible for a given master seed, independent of
sharding layout and of how many devices execute the sweep (SURVEY.md §7,
"Matched-RNG equivalence").
"""
from __future__ import annotations

import jax

# Stage identifiers. Stable numbering — changing these changes chains.
STAGE_VAR_E = 0
STAGE_FIXED = 1
STAGE_RANDOM = 2
STAGE_RANDOM_VAR = 3
STAGE_MARKER = 4
STAGE_MARKER_VAR = 5
STAGE_MARKER_PI = 6
STAGE_MARKER_ANNOT = 7
STAGE_MARKER_LV = 8
STAGE_GRN = 9


def sweep_key(chain_key, sweep):
    return jax.random.fold_in(chain_key, sweep)


def stage_key(skey, stage, index=0):
    """Key for draw-site `index` within stage `stage` of one sweep."""
    return jax.random.fold_in(jax.random.fold_in(skey, stage), index)
