"""Sharded-execution tests on the 8-virtual-device CPU mesh (SURVEY.md §4.5).

The sharded==unsharded equality at S=1 plus the exact NumPy emulation of the
S-shard block-synchronous schedule act as the framework's "race detector":
any mis-placed psum or mis-sliced random stream breaks bit-equality.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nextgp_tpu as ng
from nextgp_tpu.parallel import sharded


def _model(rng, n=80, p=64, block=8, method="PR"):
    g = rng.integers(0, 3, (n, p)).astype(float)
    y = 1.0 + (g - g.mean(0)) @ rng.normal(0, 0.2, p) + rng.normal(0, 1, n)
    if method == "PR":
        prior = ng.BayesPR(9999, 0.05)
    elif method == "R":
        prior = ng.BayesR([0.8, 0.1, 0.05, 0.05], [0.0, 1e-3, 1e-2, 1e-1], 1.0, estimatePi=True)
    elif method == "C":
        prior = ng.BayesC(0.3, 0.05, estimatePi=True)
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        markers=[ng.MarkerTerm("M1", ng.from_array(g), prior)],
        block_size=block,
    )
    return ng.assemble(spec), g, y


@pytest.mark.parametrize("method", ["PR", "R", "C"])
def test_one_shard_bitwise_equals_engine(rng, method):
    (plan, state), _, _ = _model(rng, method=method)
    key = jax.random.key(5)
    sweep = jax.jit(ng.make_sweep(plan))
    s1 = state
    for _ in range(3):
        s1 = sweep(s1, key)
    mesh = sharded.make_mesh(1, 1, devices=jax.devices()[:1])
    b = sharded.distribute(plan, state, mesh, 1)
    f = sharded.make_sharded_sweep(plan, mesh, n_sweeps=3)(b)
    r = f(b, key[None])
    # float leaves agree to round-off (XLA may fuse differently under
    # shard_map); integer draws must match exactly
    np.testing.assert_allclose(
        np.asarray(r.markers[0].beta[0]), np.asarray(s1.markers[0].beta), rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(r.ycorr[0]), np.asarray(s1.ycorr), rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(r.markers[0].var_beta[0]), np.asarray(s1.markers[0].var_beta), rtol=1e-10
    )
    assert jnp.array_equal(r.markers[0].delta[0], s1.markers[0].delta)


def test_multi_shard_matches_numpy_schedule_emulation(rng):
    """S=2 BayesPR must equal an exact NumPy emulation of the
    block-synchronous schedule: per superstep, each shard's block scans
    sequentially against the superstep-start residual + its own updates;
    corrections then merge (the psum)."""
    (plan, state), g, y = _model(rng, n=60, p=64, block=8, method="PR")
    mp = plan.markers[0]
    S = 2
    key = jax.random.key(7)
    mesh = sharded.make_mesh(1, S, devices=jax.devices()[:S])
    b = sharded.distribute(plan, state, mesh, 1)
    f = sharded.make_sharded_sweep(plan, mesh, n_sweeps=2)(b)
    r = f(b, key[None])

    # ---- NumPy emulation with identical streams
    from nextgp_tpu.engine import rng as RNG

    mc = g - g.mean(0)
    n = len(y)
    mpm = (mc * mc).sum(0)
    ycorr = y.astype(float).copy()
    beta = np.zeros(mp.p_pad)
    var_beta = np.array(np.asarray(state.markers[0].var_beta), dtype=float)
    e_scale = float(state.e.scale)
    bcoef = 0.0
    nb = mp.n_blocks
    nb_l = nb // S
    B = mp.block
    sweep_idx = 0
    for _ in range(2):
        skey = RNG.sweep_key(key, sweep_idx)
        kv_e = RNG.stage_key(skey, RNG.STAGE_VAR_E)
        var_e = float(
            (plan.e_df * e_scale + ycorr @ ycorr)
            / (2.0 * np.asarray(jax.random.gamma(kv_e, (plan.e_df + n) / 2.0)))
        )
        kf = RNG.stage_key(skey, RNG.STAGE_FIXED, 0)
        z0 = float(np.asarray(jax.random.normal(kf, (1,)))[0])
        x = np.ones(n)
        ycorr += x * bcoef
        lhs = n / var_e
        bcoef = (x @ ycorr / var_e) / lhs + z0 * np.sqrt(1 / lhs)
        ycorr -= x * bcoef
        km = RNG.stage_key(skey, RNG.STAGE_MARKER, 0)
        kz, kvv = jax.random.split(km, 2)
        z = np.asarray(jax.random.normal(kz, (mp.p_pad,)))
        ivb = 1.0 / var_beta[0]
        for t in range(nb_l):
            yfrozen = ycorr.copy()
            corr_sum = np.zeros(n)
            for d in range(S):
                blk = d * nb_l + t
                yloc = yfrozen.copy()
                for j in range(B):
                    locus = blk * B + j
                    if locus >= mp.p:
                        continue
                    col = mc[:, locus]
                    yloc += beta[locus] * col
                    rhs = col @ yloc / var_e
                    lhs = mpm[locus] / var_e + ivb
                    beta[locus] = rhs / lhs + z[locus] * np.sqrt(1 / lhs)
                    yloc -= beta[locus] * col
                corr_sum += yloc - yfrozen
            ycorr = yfrozen + corr_sum
        ss = beta @ beta
        chi = 2.0 * np.asarray(jax.random.gamma(kvv, jnp.asarray([(mp.df + mp.p) / 2.0])))[0]
        var_beta[0] = (float(state.markers[0].scale) * mp.df + ss) / chi
        sweep_idx += 1

    np.testing.assert_allclose(np.asarray(r.markers[0].beta[0])[: mp.p], beta[: mp.p], rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(r.ycorr[0]), ycorr, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(r.markers[0].var_beta[0][0]), var_beta[0], rtol=1e-9)


def test_shards_compose_with_vshards_matches_emulation(rng):
    """S=2 devices x V=4 virtual shards (V_local=2 per device), BayesPR.
    The S-device run must (a) equal the single-device vshards=4 run — the
    composed schedule is by construction the same chain — and (b) equal an
    independent NumPy emulation of the 4-wide block-synchronous schedule:
    per superstep t, chain c scans block c*T + t against the frozen
    residual; corrections then merge."""
    n, p, block = 60, 64, 8  # nb = 8 blocks, V = 4 -> T = 2 supersteps
    g = rng.integers(0, 3, (n, p)).astype(float)
    y = 1.0 + (g - g.mean(0)) @ rng.normal(0, 0.2, p) + rng.normal(0, 1, n)
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        markers=[ng.MarkerTerm("M1", ng.from_array(g), ng.BayesPR(9999, 0.05))],
        block_size=block,
    )
    plan, state = ng.assemble(spec, vshards=4)
    mp = plan.markers[0]
    assert mp.vshards == 4
    key = jax.random.key(7)

    # single-device vshards=4
    sweep = jax.jit(ng.make_sweep(plan))
    s1 = state
    for _ in range(2):
        s1 = sweep(s1, key)

    # 2 devices x 2 local vshards
    S = 2
    mesh = sharded.make_mesh(1, S, devices=jax.devices()[:S])
    b = sharded.distribute(plan, state, mesh, 1)
    f = sharded.make_sharded_sweep(plan, mesh, n_sweeps=2)(b)
    r = f(b, key[None])

    np.testing.assert_allclose(
        np.asarray(r.markers[0].beta[0]), np.asarray(s1.markers[0].beta),
        rtol=1e-9, atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(r.ycorr[0]), np.asarray(s1.ycorr), rtol=1e-9, atol=1e-11
    )

    # ---- independent NumPy emulation of the V=4-wide schedule
    from nextgp_tpu.engine import rng as RNG

    V = 4
    mc = g - g.mean(0)
    mpm = (mc * mc).sum(0)
    ycorr = y.astype(float).copy()
    beta = np.zeros(mp.p_pad)
    var_beta = np.array(np.asarray(state.markers[0].var_beta), dtype=float)
    e_scale = float(state.e.scale)
    bcoef = 0.0
    nb = mp.n_blocks
    T = nb // V
    B = mp.block
    for sweep_idx in range(2):
        skey = RNG.sweep_key(key, sweep_idx)
        kv_e = RNG.stage_key(skey, RNG.STAGE_VAR_E)
        var_e = float(
            (plan.e_df * e_scale + ycorr @ ycorr)
            / (2.0 * np.asarray(jax.random.gamma(kv_e, (plan.e_df + n) / 2.0)))
        )
        kf = RNG.stage_key(skey, RNG.STAGE_FIXED, 0)
        z0 = float(np.asarray(jax.random.normal(kf, (1,)))[0])
        x = np.ones(n)
        ycorr += x * bcoef
        lhs = n / var_e
        bcoef = (x @ ycorr / var_e) / lhs + z0 * np.sqrt(1 / lhs)
        ycorr -= x * bcoef
        km = RNG.stage_key(skey, RNG.STAGE_MARKER, 0)
        kz, kvv = jax.random.split(km, 2)
        z = np.asarray(jax.random.normal(kz, (mp.p_pad,)))
        ivb = 1.0 / var_beta[0]
        for t in range(T):
            yfrozen = ycorr.copy()
            corr_sum = np.zeros(n)
            for c in range(V):
                blk = c * T + t
                yloc = yfrozen.copy()
                for j in range(B):
                    locus = blk * B + j
                    if locus >= mp.p:
                        continue
                    col = mc[:, locus]
                    yloc += beta[locus] * col
                    rhs = col @ yloc / var_e
                    lhs = mpm[locus] / var_e + ivb
                    beta[locus] = rhs / lhs + z[locus] * np.sqrt(1 / lhs)
                    yloc -= beta[locus] * col
                corr_sum += yloc - yfrozen
            ycorr = yfrozen + corr_sum
        ss = beta @ beta
        chi = 2.0 * np.asarray(jax.random.gamma(kvv, jnp.asarray([(mp.df + mp.p) / 2.0])))[0]
        var_beta[0] = (float(state.markers[0].scale) * mp.df + ss) / chi

    np.testing.assert_allclose(
        np.asarray(r.markers[0].beta[0])[: mp.p], beta[: mp.p], rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(r.ycorr[0]), ycorr, rtol=1e-9, atol=1e-9)


def test_sharded_cg_random_effect(rng):
    """A sampler='cg' pedigree-style random effect must run under the
    sharded sweep (VERDICT r1 weak #4: it used to crash at trace)."""
    n, p = 48, 32
    g = rng.integers(0, 3, (n, p)).astype(float)
    herd = rng.integers(0, 6, n)
    y = 1.0 + (g - g.mean(0)) @ rng.normal(0, 0.2, p) + rng.normal(0, 1, n)
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        random=[ng.RandomTerm("herd", None, z_idx=herd, n_levels=6,
                              prior=ng.Random("I", 0.5, sampler="cg"))],
        markers=[ng.MarkerTerm("M1", ng.from_array(g), ng.BayesPR(9999, 0.05))],
        block_size=8,
    )
    # vshards=2: the single-device run then uses the same 2-wide schedule as
    # the S=2 sharded run, so the chains are comparable draw-for-draw
    plan, state = ng.assemble(spec, vshards=2)
    assert plan.random[0].sampler == "cg"
    key = jax.random.key(3)
    sweep = jax.jit(ng.make_sweep(plan))
    s1 = state
    for _ in range(3):
        s1 = sweep(s1, key)
    mesh = sharded.make_mesh(1, 2, devices=jax.devices()[:2])
    b = sharded.distribute(plan, state, mesh, 1)
    f = sharded.make_sharded_sweep(plan, mesh, n_sweeps=3)(b)
    r = f(b, key[None])
    np.testing.assert_allclose(
        np.asarray(r.random[0].u[0]), np.asarray(s1.random[0].u), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(r.ycorr[0]), np.asarray(s1.ycorr), rtol=1e-8, atol=1e-10
    )


def test_four_shards_two_chains_deterministic(rng):
    (plan, state), _, _ = _model(rng, method="R")
    mesh = sharded.make_mesh(2, 4)
    b = sharded.distribute(plan, state, mesh, 2)
    f = sharded.make_sharded_sweep(plan, mesh, n_sweeps=3)(b)
    keys = jax.random.split(jax.random.key(9), 2)
    r1 = f(b, keys)
    r2 = f(sharded.distribute(plan, state, mesh, 2), keys)
    assert jnp.array_equal(r1.markers[0].beta, r2.markers[0].beta)
    assert jnp.isfinite(r1.ycorr).all()
    # chains evolve independently
    assert not jnp.array_equal(r1.markers[0].beta[0], r1.markers[0].beta[1])


def test_sharded_posterior_agrees_statistically(rng):
    """Schedule change must not shift the posterior: compare EBV posterior
    means between S=1 and S=8 on a conjugate-ish ridge problem."""
    n, p = 150, 64
    g = rng.integers(0, 3, (n, p)).astype(float)
    gc = g - g.mean(0)
    beta_true = rng.normal(0, 0.2, p)
    y = gc @ beta_true + rng.normal(0, 1, n)
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        markers=[ng.MarkerTerm("M1", ng.from_array(g), ng.BayesPR(9999, 0.04))],
        block_size=8,
    )
    plan, state = ng.assemble(spec)
    key = jax.random.key(0)

    def run(S, sweeps=400, burn=100):
        mesh = sharded.make_mesh(1, S, devices=jax.devices()[:S])
        b = sharded.distribute(plan, state, mesh, 1)
        step = sharded.make_sharded_sweep(plan, mesh, n_sweeps=10)(b)
        tot = np.zeros(p)
        cnt = 0
        for i in range(sweeps // 10):
            b = step(b, key[None])
            if i * 10 >= burn:
                tot += np.asarray(b.markers[0].beta[0][:p])
                cnt += 1
        return tot / cnt

    m1 = run(1)
    m8 = run(8)
    assert np.corrcoef(gc @ m1, gc @ m8)[0, 1] > 0.98


def _corr_model(rng, n=60, p=32, block=8):
    from nextgp_tpu.api.spec import CorrMarkerTerm

    g1 = rng.integers(0, 3, (n, p)).astype(float)
    g2 = rng.integers(0, 3, (n, p)).astype(float)
    y = (1.0
         + (g1 - g1.mean(0)) @ rng.normal(0, 0.15, p)
         + (g2 - g2.mean(0)) @ rng.normal(0, 0.1, p)
         + rng.normal(0, 1, n))
    v = np.array([[0.02, 0.005], [0.005, 0.015]])
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        corr_markers=[CorrMarkerTerm(
            ("M1", "M2"), (ng.from_array(g1), ng.from_array(g2)),
            ng.BayesPR(9999, v))],
        block_size=block,
    )
    return ng.assemble(spec), (g1, g2), y


def test_corr_markers_one_shard_bitwise_equals_engine(rng):
    """Correlated marker sets on the device mesh (VERDICT r3 weak #4):
    S=1 sharded must reproduce the single-device chain."""
    (plan, state), _, _ = _corr_model(rng)
    key = jax.random.key(5)
    sweep = jax.jit(ng.make_sweep(plan))
    s1 = state
    for _ in range(3):
        s1 = sweep(s1, key)
    mesh = sharded.make_mesh(1, 1, devices=jax.devices()[:1])
    b = sharded.distribute(plan, state, mesh, 1)
    f = sharded.make_sharded_sweep(plan, mesh, n_sweeps=3)(b)
    r = f(b, key[None])
    np.testing.assert_allclose(
        np.asarray(r.corr_markers[0].beta[0]),
        np.asarray(s1.corr_markers[0].beta), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(r.ycorr[0]), np.asarray(s1.ycorr), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(r.corr_markers[0].var_beta[0]),
        np.asarray(s1.corr_markers[0].var_beta), rtol=1e-10)


def test_corr_markers_two_shards_consistent(rng):
    """S=2 corr schedule: exact residual identity ycorr = y - Xb - sum_t
    Mc_t beta_t (any mis-psum'd correction breaks it), determinism, and
    posterior beta agreement with the single-device chain."""
    (plan, state), (g1, g2), y = _corr_model(rng)
    cp = plan.corr_markers[0]
    mesh = sharded.make_mesh(1, 2, devices=jax.devices()[:2])
    b = sharded.distribute(plan, state, mesh, 1)
    key = jax.random.key(7)
    step = sharded.make_sharded_sweep(plan, mesh, n_sweeps=20)(b)
    out = step(b, key[None])
    out2 = sharded.make_sharded_sweep(plan, mesh, n_sweeps=20)(b)(b, key[None])

    beta = np.asarray(out.corr_markers[0].beta[0])[: cp.p]
    gc1 = g1 - g1.mean(0)
    gc2 = g2 - g2.mean(0)
    recon = y - np.asarray(out.fixed[0].b[0])[0] - gc1 @ beta[:, 0] - gc2 @ beta[:, 1]
    assert np.abs(np.asarray(out.ycorr[0]) - recon).max() < 1e-8
    # determinism: same key -> same chain
    np.testing.assert_array_equal(
        np.asarray(out.corr_markers[0].beta), np.asarray(out2.corr_markers[0].beta))

    # statistical agreement with the single-device posterior (schedule
    # changes the per-draw chain, not the stationary distribution)
    sweep = jax.jit(ng.make_sweep(plan))
    step1 = sharded.make_sharded_sweep(plan, mesh, n_sweeps=1)(b)
    s1 = state
    acc1 = np.zeros_like(beta)
    accS = np.zeros_like(beta)
    bb = b
    kept = 0
    for it in range(120):
        s1 = sweep(s1, jax.random.fold_in(key, it))
        bb = step1(bb, jax.random.fold_in(key, it)[None])
        if it >= 40:
            kept += 1
            acc1 += np.asarray(s1.corr_markers[0].beta)[: cp.p]
            accS += np.asarray(bb.corr_markers[0].beta[0])[: cp.p]
    ebv1 = gc1 @ acc1[:, 0] + gc2 @ acc1[:, 1]
    ebvS = gc1 @ accS[:, 0] + gc2 @ accS[:, 1]
    assert np.corrcoef(ebv1, ebvS)[0, 1] > 0.95


def test_corr_markers_shards_compose_with_vshards(rng):
    """Corr sets assembled with vshards=V: the S-device run equals the
    single-device V-wide chain (same invariant as plain sets; the r5
    multichip dryrun certifies the same thing on the production model)."""
    from nextgp_tpu.api.spec import CorrMarkerTerm

    n, p, block = 48, 32, 4
    g1 = rng.integers(0, 3, (n, p)).astype(float)
    g2 = rng.integers(0, 3, (n, p)).astype(float)
    y = (1.0 + (g1 - g1.mean(0)) @ rng.normal(0, 0.15, p)
         + rng.normal(0, 1, n))
    v = np.array([[0.02, 0.005], [0.005, 0.015]])
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        corr_markers=[CorrMarkerTerm(
            ("M1", "M2"), (ng.from_array(g1), ng.from_array(g2)),
            ng.BayesPR(9999, v))],
        block_size=block,
    )
    plan, state = ng.assemble(spec, vshards=4)
    assert plan.corr_markers[0].vshards == 4
    key = jax.random.key(11)
    sweep = jax.jit(ng.make_sweep(plan))
    s1 = state
    for _ in range(2):
        s1 = sweep(s1, key)
    mesh = sharded.make_mesh(1, 2, devices=jax.devices()[:2])
    b = sharded.distribute(plan, state, mesh, 1)
    r = sharded.make_sharded_sweep(plan, mesh, n_sweeps=2)(b)(b, key[None])
    np.testing.assert_allclose(
        np.asarray(r.corr_markers[0].beta[0]),
        np.asarray(s1.corr_markers[0].beta), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(r.ycorr[0]), np.asarray(s1.ycorr), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(r.corr_markers[0].var_beta[0]),
        np.asarray(s1.corr_markers[0].var_beta), rtol=1e-9)
