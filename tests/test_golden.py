"""Golden-model equivalence: JAX engine vs float64 sequential oracle.

The oracle (tests/golden_oracle.py) replays the reference's per-locus
update order (functions.jl) with naive dense algebra on the same random
streams; the engine's blocked Gram scan must agree to f64 round-off
(SURVEY.md §4.2).
"""
import numpy as np
import jax
import pytest

import nextgp_tpu as ng
from golden_oracle import Oracle


def _sim(rng, n=60, p=48, h2=0.5):
    g = rng.integers(0, 3, size=(n, p)).astype(float)
    gc = g - g.mean(0)
    beta = rng.normal(0, 0.15, p)
    sig = gc @ beta
    noise = rng.normal(0, np.std(sig) * np.sqrt((1 - h2) / h2) + 1e-9, n)
    y = 1.5 + sig + noise
    return g, y


def _run_both(spec, n_sweeps=3, seed=11):
    plan, state = ng.assemble(spec)
    oracle = Oracle(plan, state, spec)
    sweep = jax.jit(ng.make_sweep(plan))
    key = jax.random.key(seed)
    for _ in range(n_sweeps):
        state = sweep(state, key)
        oracle.sweep(key)
    return plan, state, oracle


def _check(plan, state, oracle, tol=1e-8):
    np.testing.assert_allclose(np.asarray(state.ycorr), oracle.ycorr, rtol=tol, atol=tol)
    assert np.isclose(float(state.e.var_e), oracle.var_e, rtol=tol)
    for fs, f in zip(state.fixed, oracle.fixed):
        np.testing.assert_allclose(np.asarray(fs.b), f["b"], rtol=tol, atol=tol)
    for rs, r in zip(state.random, oracle.random):
        np.testing.assert_allclose(np.asarray(rs.u), r["u"], rtol=tol, atol=tol)
        np.testing.assert_allclose(np.asarray(rs.var_u), r["var_u"], rtol=tol, atol=tol)
    for ms, m, mp in zip(state.markers, oracle.markers, plan.markers):
        np.testing.assert_allclose(np.asarray(ms.beta[: mp.p]), m["beta"], rtol=tol, atol=tol)
        nv = min(mp.n_var, mp.p)
        np.testing.assert_allclose(
            np.asarray(ms.var_beta[:nv]), np.asarray(m["var_beta"][:nv]), rtol=tol, atol=tol
        )
        np.testing.assert_array_equal(np.asarray(ms.delta[: mp.p]), m["delta"][: mp.p])


def test_bayespr_whole_genome(rng):
    g, y = _sim(rng)
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(len(y)))],
        markers=[ng.MarkerTerm("M1", ng.from_array(g), ng.BayesPR(9999, 0.02))],
        block_size=16,
    )
    _check(*_run_both(spec))


def test_bayespr_per_locus_regions(rng):
    g, y = _sim(rng)
    spec = ng.ModelSpec(
        y=y,
        markers=[ng.MarkerTerm("M1", ng.from_array(g), ng.BayesPR(1, 0.02))],
        block_size=16,
    )
    _check(*_run_both(spec))


def test_bayespr_windowed_regions_with_map(rng):
    g, y = _sim(rng)
    chr_ids = np.r_[np.ones(20), np.full(28, 2)].astype(int)
    md = ng.from_array(g, chr_ids=chr_ids)
    spec = ng.ModelSpec(
        y=y,
        markers=[ng.MarkerTerm("M1", md, ng.BayesPR(7, 0.02))],
        block_size=16,
    )
    plan, state, oracle = _run_both(spec)
    assert plan.markers[0].n_regions == 3 + 4  # ceil(20/7) + ceil(28/7)
    _check(plan, state, oracle)


def test_bayesb(rng):
    g, y = _sim(rng)
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(len(y)))],
        markers=[ng.MarkerTerm("M1", ng.from_array(g), ng.BayesB(0.3, 0.05, estimatePi=True))],
        block_size=16,
    )
    _check(*_run_both(spec, n_sweeps=4))


def test_bayesc(rng):
    g, y = _sim(rng)
    spec = ng.ModelSpec(
        y=y,
        markers=[ng.MarkerTerm("M1", ng.from_array(g), ng.BayesC(0.2, 0.05, estimatePi=True))],
        block_size=16,
    )
    _check(*_run_both(spec, n_sweeps=4))


def test_bayesr(rng):
    g, y = _sim(rng)
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(len(y)))],
        markers=[
            ng.MarkerTerm(
                "M1",
                ng.from_array(g),
                ng.BayesR([0.7, 0.15, 0.1, 0.05], [0.0, 1e-4, 1e-3, 1e-2], 2.0, estimatePi=True),
            )
        ],
        block_size=16,
    )
    _check(*_run_both(spec, n_sweeps=4))


def test_bayesrcpi(rng):
    g, y = _sim(rng)
    p = g.shape[1]
    annot = np.zeros((p, 3), dtype=int)
    annot[np.arange(p) % 3 == 0, 0] = 1
    annot[np.arange(p) % 3 == 1, 1] = 1
    annot[:, 2] = 1  # overlapping annotation
    spec = ng.ModelSpec(
        y=y,
        markers=[
            ng.MarkerTerm(
                "M1",
                ng.from_array(g),
                ng.BayesRCpi([0.7, 0.2, 0.1], [0.0, 1e-3, 1e-2], 2.0, annot, estimatePi=True),
            )
        ],
        block_size=16,
    )
    _check(*_run_both(spec, n_sweeps=3))
    # annot_prob rows must stay normalized
    _, state, oracle = _run_both(spec, n_sweeps=3)
    ap = np.asarray(state.markers[0].annot_prob[: p])
    np.testing.assert_allclose(ap.sum(1), 1.0, rtol=1e-9)
    np.testing.assert_allclose(ap, oracle.markers[0]["annot_prob"][:p], rtol=1e-8, atol=1e-8)


def test_bayesrcplus(rng):
    g, y = _sim(rng)
    p = g.shape[1]
    annot = np.zeros((p, 2), dtype=int)
    annot[: p // 2, 0] = 1
    annot[p // 3 :, 1] = 1
    spec = ng.ModelSpec(
        y=y,
        markers=[
            ng.MarkerTerm(
                "M1",
                ng.from_array(g),
                ng.BayesRCplus([0.6, 0.3, 0.1], [0.0, 1e-3, 1e-2], 2.0, annot),
            )
        ],
        block_size=16,
    )
    _check(*_run_both(spec, n_sweeps=3))


def test_bayeslv(rng):
    g, y = _sim(rng)
    p = g.shape[1]
    C = np.c_[np.ones(p), rng.normal(size=p)]
    spec = ng.ModelSpec(
        y=y,
        markers=[
            ng.MarkerTerm("M1", ng.from_array(g), ng.BayesLV(0.01, C, 0.1, estimateVarZeta=True))
        ],
        block_size=16,
    )
    plan, state, oracle = _run_both(spec, n_sweeps=3)
    _check(plan, state, oracle)
    m = oracle.markers[0]
    np.testing.assert_allclose(np.asarray(state.markers[0].lv_c), m["lv_c"], rtol=1e-8)
    np.testing.assert_allclose(float(state.markers[0].var_zeta), float(m["var_zeta"]), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(state.markers[0].var_beta[:p]), m["var_beta"][:p], rtol=1e-8
    )


def test_correlated_marker_sets(rng):
    """Tuple (M1, M2) BayesPR path (mme.jl:448-489, functions.jl:140-154)."""
    n, p = 60, 32
    g1 = rng.integers(0, 3, (n, p)).astype(float)
    g2 = rng.integers(0, 3, (n, p)).astype(float)
    y = (
        1.0
        + (g1 - g1.mean(0)) @ rng.normal(0, 0.15, p)
        + (g2 - g2.mean(0)) @ rng.normal(0, 0.1, p)
        + rng.normal(0, 1, n)
    )
    v = np.array([[0.02, 0.005], [0.005, 0.015]])
    from nextgp_tpu.api.spec import CorrMarkerTerm

    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        corr_markers=[
            CorrMarkerTerm(("M1", "M2"), (ng.from_array(g1), ng.from_array(g2)), ng.BayesPR(9999, v))
        ],
        block_size=16,
    )
    plan, state = ng.assemble(spec)
    oracle = Oracle(plan, state, spec)
    sweep = jax.jit(ng.make_sweep(plan))
    key = jax.random.key(13)
    for _ in range(3):
        state = sweep(state, key)
        oracle.sweep(key)
    cp = plan.corr_markers[0]
    np.testing.assert_allclose(
        np.asarray(state.corr_markers[0].beta[: cp.p]),
        oracle.corr_markers[0]["beta"], rtol=1e-8, atol=1e-8,
    )
    np.testing.assert_allclose(np.asarray(state.ycorr), oracle.ycorr, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(state.corr_markers[0].var_beta),
        oracle.corr_markers[0]["var_beta"], rtol=1e-8,
    )


def test_fixed_block_and_random_effect(rng):
    n = 80
    g, y = _sim(rng, n=n, p=32)
    herd = rng.integers(0, 4, n)
    herd_mat = (herd[:, None] == np.arange(4)[None, :]).astype(float)
    grp = rng.integers(0, 10, n)
    z = (grp[:, None] == np.arange(10)[None, :]).astype(float)
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n)), ng.FixedTerm("herd", herd_mat)],
        blocks=[("int", "herd")],
        random=[ng.RandomTerm("grp", z, prior=ng.Random("I", 0.5))],
        markers=[ng.MarkerTerm("M1", ng.from_array(g), ng.BayesPR(9999, 0.02))],
        block_size=16,
    )
    _check(*_run_both(spec, n_sweeps=4))


def test_correlated_random_effects(rng):
    n = 60
    g, y = _sim(rng, n=n, p=16)
    grp = rng.integers(0, 8, n)
    z1 = (grp[:, None] == np.arange(8)[None, :]).astype(float)
    z2 = z1 * rng.normal(size=(n, 1))
    v = np.array([[0.5, 0.1], [0.1, 0.3]])
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        random=[ng.RandomTerm(("a", "b"), (z1, z2), prior=ng.Random("I", v))],
        block_size=16,
    )
    _check(*_run_both(spec, n_sweeps=4))


def test_weighted_residual(rng):
    n = 60
    g, y = _sim(rng, n=n, p=32)
    w = rng.uniform(0.5, 2.0, n)
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        markers=[ng.MarkerTerm("M1", ng.from_array(g), ng.BayesPR(9999, 0.02))],
        residual=ng.Random(w, 1.0),
        block_size=16,
    )
    _check(*_run_both(spec, n_sweeps=3))


def test_weighted_residual_bayesc(rng):
    """BayesC under 'D': rrr stays the raw dot while rhs is weighted
    (functions.jl:208 vs 219)."""
    n = 60
    g, y = _sim(rng, n=n, p=32)
    w = rng.uniform(0.5, 2.0, n)
    spec = ng.ModelSpec(
        y=y,
        markers=[ng.MarkerTerm("M1", ng.from_array(g), ng.BayesC(0.3, 0.05))],
        residual=ng.Random(w, 1.0),
        block_size=16,
    )
    _check(*_run_both(spec, n_sweeps=3))


def test_summary_statistics_offsets(rng):
    g, y = _sim(rng)
    p = g.shape[1]
    ss = ng.SummaryStatistics(m=np.zeros(p), v=np.full(p, 0.5))
    spec = ng.ModelSpec(
        y=y,
        markers=[ng.MarkerTerm("M1", ng.from_array(g), ng.BayesPR(9999, 0.02))],
        summary_stats={"M1": ss},
        block_size=16,
    )
    _check(*_run_both(spec, n_sweeps=3))
