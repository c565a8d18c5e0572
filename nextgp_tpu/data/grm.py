"""Genomic relationship matrices (vanRaden methods 1 and 2).

Semantics of `makeG` (`/root/reference/src/misc.jl:122-160`): column
mean-centering, method 1 = MM'/sum(2pq), method 2 = per-locus scaling by
sqrt(2pq) then MM'/nLoci, plus a 0.001*I ridge. Host-side NumPy; the result
is shipped to device once (GBLUP uses its inverse as the random-effect
structure, prepMatVec.jl:123-127).
"""
from __future__ import annotations

import numpy as np


def make_g(m, method: int = 1, ridge: float = 0.001) -> np.ndarray:
    """vanRaden GRM from an (nInd, nSNP) 0/1/2 dosage matrix, or from a
    genotype file path (the reference's file overload, misc.jl:145-160)."""
    if isinstance(m, str):
        from .ingest import read_genotype_file

        m = read_genotype_file(m).genotypes
    m = np.asarray(m, dtype=np.float64)
    p = m.mean(axis=0) / 2.0
    q = 1.0 - p
    mc = m - m.mean(axis=0)
    if method == 1:
        g = (mc @ mc.T) / np.sum(2.0 * p * q)
    elif method == 2:
        s = np.sqrt(2.0 * p * q)
        with np.errstate(divide="ignore", invalid="ignore"):
            mc = np.where(s > 0, mc / s, 0.0)
        g = (mc @ mc.T) / len(p)
    else:
        raise ValueError("method must be 1 or 2")
    g += ridge * np.eye(m.shape[0])
    return g


def make_g_inverse(m, method: int = 1, ridge: float = 0.001) -> np.ndarray:
    """Inverse GRM, symmetrized (prepMatVec.jl:124)."""
    gi = np.linalg.inv(make_g(m, method=method, ridge=ridge))
    return (gi + gi.T) / 2.0
