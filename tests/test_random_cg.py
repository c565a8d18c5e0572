"""Perturbed-CG joint random-effect draw (sampler='cg') vs the reference's
per-level scan: same stationary conditional, validated three ways —
(1) sparse A^-1 rows and Henderson factor reproduce the dense matrices,
(2) with fixed variances the CG draws match the analytic conditional
    N(C^-1 rhs, C^-1) in mean and covariance,
(3) a full chain matches the scan sampler's posterior moments.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nextgp_tpu as ng
from nextgp_tpu.data import pedigree as P
from nextgp_tpu.engine.samplers.random_effects import sample_random_cg
from nextgp_tpu.utils import replace


@pytest.fixture
def ped(rng):
    n = 30
    sire = np.full(n, -1, np.int64)
    dam = np.full(n, -1, np.int64)
    for i in range(8, n):
        s, d = rng.integers(0, i, 2)
        if s != d:
            sire[i], dam[i] = s, d
    f = P.inbreeding_meuwissen_luo(sire, dam)
    return P.Pedigree(ids=[f"A{i}" for i in range(n)], sire=sire, dam=dam, inbreeding=f)


def test_sparse_rows_and_factor_match_dense(ped):
    dense = P.a_inverse(ped)
    idx, val = P.a_inverse_padded(ped)
    q = ped.n
    rebuilt = np.zeros((q, q))
    for i in range(q):
        for k in range(idx.shape[1]):
            rebuilt[i, idx[i, k]] += val[i, k]
    # padded (idx 0, val 0) entries add zero
    np.testing.assert_allclose(rebuilt, dense, atol=1e-12)

    sire, dam, dsq = P.a_inverse_factor(ped)
    imp = np.eye(q)
    for i in range(q):
        if sire[i] >= 0:
            imp[i, sire[i]] -= 0.5
        if dam[i] >= 0:
            imp[i, dam[i]] -= 0.5
    np.testing.assert_allclose(imp.T @ np.diag(dsq**2) @ imp, dense, atol=1e-12)


def _cg_model(ped, rng, n=60):
    q = ped.n
    lvl = rng.integers(0, q, n)
    y = rng.normal(0, 1, n)
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        random=[
            ng.RandomTerm(
                "a", None, prior=ng.Random("A", 0.8, sampler="cg"),
                z_idx=lvl, n_levels=q,
                sparse_struct=dict(
                    zip(("iv_idx", "iv_val"), P.a_inverse_padded(ped))
                ) | dict(zip(("sire", "dam", "dinv_sqrt"), P.a_inverse_factor(ped))),
            )
        ],
    )
    return spec, lvl, y


def test_cg_draw_matches_analytic_conditional(ped, rng):
    spec, lvl, y = _cg_model(ped, rng)
    plan, state = ng.assemble(spec)
    q = ped.n
    n = len(y)
    var_e, var_u = 1.3, 0.8
    rp = plan.random[0]
    rs = replace(state.random[0], var_u=jnp.asarray(var_u, jnp.float64))

    z = np.zeros((n, q))
    z[np.arange(n), lvl] = 1.0
    ainv = P.a_inverse(ped)
    C = z.T @ z / var_e + ainv / var_u
    cov = np.linalg.inv(C)
    ycorr0 = jnp.asarray(y - (z @ np.zeros(q)))
    mean = cov @ (z.T @ y) / var_e

    draws = []
    for i in range(600):
        u, _, _ = sample_random_cg(
            jax.random.key(i), rs, ycorr0, jnp.asarray(var_e), rp.df, rp
        )
        draws.append(np.asarray(u))
    draws = np.asarray(draws)
    se = np.sqrt(np.diag(cov) / len(draws))
    assert np.all(np.abs(draws.mean(0) - mean) < 5 * se)
    np.testing.assert_allclose(
        np.cov(draws.T), cov, atol=6 * np.abs(cov).max() / np.sqrt(len(draws))
    )


def test_cg_chain_matches_scan_posterior(ped, rng):
    q = ped.n
    n = 80
    lvl = rng.integers(0, q, n)
    u_true = rng.normal(0, 0.8, q)
    y = 1.0 + u_true[lvl] + rng.normal(0, 0.5, n)
    z = np.zeros((n, q))
    z[np.arange(n), lvl] = 1.0

    spec_scan = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        random=[ng.RandomTerm("a", z, prior=ng.Random("A", 0.8),
                              ivstr=P.a_inverse(ped))],
    )
    spec_cg = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        random=[
            ng.RandomTerm(
                "a", None, prior=ng.Random("A", 0.8, sampler="cg"),
                z_idx=lvl, n_levels=q,
                sparse_struct=dict(
                    zip(("iv_idx", "iv_val"), P.a_inverse_padded(ped))
                ) | dict(zip(("sire", "dam", "dinv_sqrt"), P.a_inverse_factor(ped))),
            )
        ],
    )

    def run(spec):
        plan, st = ng.assemble(spec)
        sweep = jax.jit(ng.make_sweep(plan))
        key = jax.random.key(11)
        us, vs = [], []
        for i in range(1600):
            st = sweep(st, key)
            if i >= 200:
                us.append(np.asarray(st.random[0].u))
                vs.append(float(st.random[0].var_u))
        return np.mean(us, axis=0), np.mean(vs)

    u_scan, v_scan = run(spec_scan)
    u_cg, v_cg = run(spec_cg)
    corr = np.corrcoef(u_scan, u_cg)[0, 1]
    # both chains carry MC error (the scan sampler is highly autocorrelated);
    # the analytic-conditional test above pins the CG draw exactly
    assert corr > 0.95, f"u posterior-mean corr {corr}"
    assert abs(v_scan - v_cg) < 0.35 * max(v_scan, v_cg)
