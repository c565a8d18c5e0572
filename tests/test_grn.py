"""GRN structural-equation sampler tests (GRN.jl semantics).

Independent evidence lives in scripts/ref_equiv (variant `GRN`): an
explicit-BIGM from-scratch NumPy chain (oracle_grn.py) gates the engine's
YY'-collapse sampler distributionally on Lambda1/Lambda2/varE — these
tests cover structure recovery and internals only.

No Geweke test is possible for the GRN conditionals: the executed
Lambda2 draw is UNPENALIZED least squares (the prior enters only through
alpha*pMeans which is identically zero, GRN.jl:72,153-156) and the gene
means carry no prior either (GRN.jl:109-119) — flat priors make the
joint improper, so no marginal-conditional simulator exists (same
rationale as the engine's fixed effects, test_geweke.py).
"""
import numpy as np
import pytest

from nextgp_tpu.grn.sampler import _lam1_matrix, _pairs, est_grn

import jax.numpy as jnp


def _simulate(rng, G=4, spg=3, N=200, noise=0.3):
    S = G * spg
    x = rng.integers(0, 3, (S, N)).astype(float)
    xc = x - x.mean(axis=1, keepdims=True)
    lam1 = np.zeros((G, G))
    lam1[1, 0] = 0.5  # gene0 -> gene1
    lam1[3, 2] = -0.4  # gene2 -> gene3
    lam2 = np.zeros((G, S))
    for g in range(G):  # cis effects
        lam2[g, g * spg : (g + 1) * spg] = rng.normal(0, 0.4, spg)
    mu = rng.normal(0, 1, G)
    e = rng.normal(0, noise, (G, N))
    # Y = (I - L1)^-1 (mu + L2 Xc + e)
    y = np.linalg.solve(np.eye(G) - lam1, mu[:, None] + lam2 @ xc + e)
    return x, y, lam1, lam2


def test_pairs_indexing():
    G = 3
    pr = _pairs(G)
    assert len(pr) == 6
    lam = jnp.arange(1.0, 7.0)
    m = np.asarray(_lam1_matrix(lam, G))
    assert m[0, 0] == 0 and m[1, 1] == 0
    # row-major off-diagonals
    assert m[0, 1] == 1 and m[0, 2] == 2 and m[1, 0] == 3


def test_grn_runs_and_outputs(rng, tmp_path):
    x, y, lam1, lam2 = _simulate(rng)
    acc, draws, state = est_grn(
        x, y, 4, 3, chain_length=60, burn_in=20, output_freq=5,
        out_folder=str(tmp_path / "grnout"), seed=1,
    )
    assert 0 <= acc <= 60
    assert draws["Lambda1"].shape[0] == 8
    assert np.isfinite(draws["varE"]).all()
    import os

    assert os.path.exists(tmp_path / "grnout" / "Lambda1Out")


def test_grn_recovers_structure(rng):
    x, y, lam1_true, lam2_true = _simulate(rng, noise=0.2)
    acc, draws, state = est_grn(
        x, y, 4, 3, chain_length=800, burn_in=300, output_freq=2,
        out_folder=None, seed=3,
    )
    G = 4
    lam1_mean = draws["Lambda1"].mean(axis=0).reshape(G, G).T  # column-major dump
    # strongest entries recovered with right sign
    assert lam1_mean[1, 0] > 0.2
    assert lam1_mean[3, 2] < -0.15
    lam2_mean = draws["Lambda2"].mean(axis=0).reshape(-1, G).T
    corr = np.corrcoef(lam2_mean.ravel(), lam2_true.ravel())[0, 1]
    assert corr > 0.7
    # residual variance in the right ballpark
    assert 0.01 < draws["varE"].mean() < 1.0
    assert acc > 0  # MH moves
