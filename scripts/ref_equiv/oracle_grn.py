"""Independent plain-NumPy GRN oracle — explicit BIGM, no YY' collapse.

A from-scratch MH-within-Gibbs chain written directly against
/root/reference/src/GRN.jl:14-145, deliberately materializing the
per-individual block-diagonal BIGM design exactly as lambda1BIGM builds it
(GRN.jl:167-180) and accumulating MpM / RHS by the reference's explicit
per-individual loops (GRN.jl:199-213). The repo engine (grn/sampler.py)
instead collapses BIGM to YY'-block algebra — the riskiest algebra rewrite
in the codebase (VERDICT r4 missing #3); THIS oracle shares none of that
code, uses its own np.random.Generator, and can only agree with the engine
in distribution if the collapse is exact.

Reference semantics replicated literally:
  * Xc centered by row means (GRN.jl:23); yCorr = Y - mu - L1 Y - L2 Xc
    (GRN.jl:95) with BIGM built ONCE from that INITIAL yCorr (GRN.jl:98)
    — at the default zero starts the regressors are the centered Y.
  * lambda1 coefficient order: row-major off-diagonals of Lambda1
    (get_offdiagPos transposes column-major CartesianIndices, GRN.jl:52-54)
    matching BIGM's per-gene blocks of other-gene expression.
  * Lambda1 MH: independence proposal N(iLHS RHS, iLHS sigma2e) with
    iLHS = inv(MpM + I ve/tau2); target includes the det(I-Lambda1)^(N/2)
    Jacobian and the SAME normal quadratic (lambdat = proposal mean), so
    the normal terms do NOT cancel (GRN.jl:182-224). A negative det makes
    log A = nan -> reject, as the reference's rand() < NaN does.
  * Lambda2: per-gene per-SNP scan with UNPENALIZED least-squares draws —
    the prior enters only through alpha*pMeans which is identically zero
    (GRN.jl:72,150-164).
  * Hyperpriors df=4 everywhere, varLambda1 = varBeta = 5e-4, nuS =
    scale*df with scale = v*(df-2)/df (GRN.jl:68-90).
"""
from __future__ import annotations

import numpy as np


def offdiag_pairs(G):
    """Row-major off-diagonal (g, k) order = reference posL1 (GRN.jl:52-54)."""
    return [(g, k) for g in range(G) for k in range(G) if k != g]


def build_bigm(ycorr0):
    """lambda1BIGM (GRN.jl:167-180): per individual i, the (G, G(G-1))
    block-diagonal matrix whose row g holds the OTHER genes' initial
    residual values for individual i."""
    G, N = ycorr0.shape
    bigm = np.zeros((N, G, G * (G - 1)))
    for i in range(N):
        for g in range(G):
            others = [k for k in range(G) if k != g]
            bigm[i, g, g * (G - 1):(g + 1) * (G - 1)] = ycorr0[others, i]
    return bigm


def run_grn_oracle(x, y, chain=3000, burn=500, thin=10, seed=1,
                   prior_res=1.0, mean_l1=0.0, start_l1=None):
    """x: (nSNP, nInd) dosages; y: (nGenes, nInd) expression.
    Returns posterior means of Lambda1 (G,G), Lambda2 (G,S), varE,
    varLambda1, varBeta, mu, plus the acceptance count."""
    rng = np.random.default_rng(seed)
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    S, N = x.shape
    G = y.shape[0]
    xc = x - x.mean(axis=1, keepdims=True)
    n_l = G * (G - 1)
    pairs = offdiag_pairs(G)
    n_records = G * N

    df = 4.0
    var_l1 = 5e-4
    var_beta = np.full(G, 5e-4)
    nu_s_l1 = var_l1 * (df - 2.0)
    nu_s_b = 5e-4 * (df - 2.0)
    nu_s_e = prior_res * (df - 2.0)

    mu = y.mean(axis=1)
    # startλ1 (GRN.jl:14 keyword; default zeros). A nonzero start keeps
    # var_l1's first draw off the floor — from λ1 = 0 the chain enters a
    # metastable stuck mode (var_l1 ~ nuS/χ² ≈ 4e-5 shrinks the proposal
    # mean to ~0, acceptance ~ e^-χ²(nλ)/2) that both this oracle and the
    # engine can take thousands of sweeps to escape.
    lam1 = np.zeros(n_l) if start_l1 is None else np.asarray(
        start_l1, np.float64).copy()
    lam1_mat = np.zeros((G, G))
    for (g, k), v_ in zip(pairs, lam1):
        lam1_mat[g, k] = v_
    lam2 = np.zeros((G, S))
    ycorr = y - mu[:, None] - lam1_mat @ y - lam2 @ xc  # GRN.jl:95

    bigm = build_bigm(ycorr)  # fixed regressors (GRN.jl:98)
    # sum MpM = BIGM'BIGM accumulated explicitly per individual (GRN.jl:100)
    mpm = np.zeros((n_l, n_l))
    for i in range(N):
        mpm += bigm[i].T @ bigm[i]

    xx = np.einsum("sn,sn->s", xc, xc)
    accept = 0
    kept = 0
    s = dict(l1=np.zeros((G, G)), l2=np.zeros((G, S)), ve=0.0, vl1=0.0,
             vb=np.zeros(G), mu=np.zeros(G))

    for it in range(1, chain + 1):
        # 1) varE (GRN.jl:106,245-247)
        var_e = (nu_s_e + np.sum(ycorr * ycorr)) / rng.chisquare(df + n_records)

        # 2) means (GRN.jl:109-119)
        ycorr += mu[:, None]
        mean_mu = ycorr.sum(axis=1) / N
        mu = mean_mu + np.sqrt(var_e / N) * rng.standard_normal(G)
        ycorr -= mu[:, None]

        # 3) Lambda1 MH (GRN.jl:122,192-232) — explicit per-individual loops
        for i in range(N):
            ycorr[:, i] += bigm[i] @ lam1
        ilhs = np.linalg.inv(mpm + np.eye(n_l) * (var_e / var_l1))
        rhs = np.full(n_l, mean_l1 * (var_e / var_l1))
        for i in range(N):
            rhs += bigm[i].T @ ycorr[:, i]
        l1_mean = ilhs @ rhs
        l1_cov = ilhs * var_e
        chol = np.linalg.cholesky((l1_cov + l1_cov.T) / 2.0)
        prop = l1_mean + chol @ rng.standard_normal(n_l)
        icov = np.linalg.inv(l1_cov)

        def log_target(vec):
            m = np.zeros((G, G))
            for (g, k), v_ in zip(pairs, vec):
                m[g, k] = v_
            star = np.eye(G) - m
            det = np.linalg.det(star)
            with np.errstate(invalid="ignore", divide="ignore"):
                ld = np.log(det)  # negative det -> nan -> rejected, as ref
            d = vec - l1_mean
            return (N / 2.0) * ld - 0.5 * (d @ icov @ d)

        log_a = log_target(prop) - log_target(lam1)
        if rng.uniform() < np.exp(min(log_a, 0.0) if np.isfinite(log_a) else -np.inf):
            lam1 = prop.copy()
            accept += 1
        lam1_mat = np.zeros((G, G))
        for (g, k), v_ in zip(pairs, lam1):
            lam1_mat[g, k] = v_
        for i in range(N):
            ycorr[:, i] -= bigm[i] @ lam1

        # 4) var(lambda1) (GRN.jl:125,238-240)
        d1 = lam1 - mean_l1
        var_l1 = (nu_s_l1 + d1 @ d1) / rng.chisquare(df + n_l)

        # 5) Lambda2 single-site Gibbs (GRN.jl:128,150-164)
        for g in range(G):
            for q in range(S):
                ycorr[g] += lam2[g, q] * xc[q]
                rhs_q = xc[q] @ ycorr[g]  # + alpha*pMeans[g] == 0
                lhs_q = xx[q]
                b = rng.normal(rhs_q / lhs_q, np.sqrt(var_e / lhs_q))
                lam2[g, q] = b
                ycorr[g] -= b * xc[q]

        # 6) per-gene SNP variances (GRN.jl:131-133,242-244)
        for g in range(G):
            var_beta[g] = (nu_s_b + lam2[g] @ lam2[g]) / rng.chisquare(df + S)

        if it > burn and (it - burn) % thin == 0:
            kept += 1
            s["l1"] += lam1_mat
            s["l2"] += lam2
            s["ve"] += var_e
            s["vl1"] += var_l1
            s["vb"] += var_beta
            s["mu"] += mu

    return {
        "lambda1_mean": s["l1"] / kept,
        "lambda2_mean": s["l2"] / kept,
        "var_e_mean": s["ve"] / kept,
        "var_l1_mean": s["vl1"] / kept,
        "var_beta_mean": s["vb"] / kept,
        "mu_mean": s["mu"] / kept,
        "accept": accept,
        "kept": kept,
    }
