"""End-to-end run_lmem + formula front-end + IO tests."""
import os

import numpy as np
import pytest

import nextgp_tpu as ng
from nextgp_tpu.api.formula import parse_formula
from nextgp_tpu.io.summary import ess_bulk, read_samples, split_rhat, summary_mcmc
from nextgp_tpu.runtime import run_lmem


def _data(rng, n=120, p=48):
    g = rng.integers(0, 3, (n, p)).astype(float)
    gc = g - g.mean(0)
    beta = rng.normal(0, 0.2, p)
    herd = rng.integers(1, 4, n)
    y = 1.0 + 0.5 * (herd == 2) + gc @ beta + rng.normal(0, 1, n)
    return g, y, herd, beta, gc


def test_run_lmem_end_to_end(rng, tmp_path):
    g, y, herd, beta, gc = _data(rng)
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(len(y)))],
        markers=[ng.MarkerTerm("M1", ng.from_array(g), ng.BayesPR(9999, 0.04))],
        block_size=16,
    )
    out = str(tmp_path / "out")
    res = run_lmem(spec, n_chain=300, n_burn=100, n_thin=10, out_folder=out, seed=1)
    assert res.draws["betaM1"].shape == (20, 48)
    assert res.sweeps_per_sec > 0
    # files mirror the reference layout (<name>Out, header + rows)
    b = read_samples("b", out)
    assert b.shape == (20, 1)
    m = summary_mcmc("betaM1", out)
    np.testing.assert_allclose(m, res.posterior_mean("betaM1"), rtol=1e-6)
    ve = read_samples("varE", out)
    assert np.isfinite(ve).all()
    # posterior mean EBV tracks the truth
    ebv = gc @ res.posterior_mean("betaM1")
    assert np.corrcoef(ebv, gc @ beta)[0, 1] > 0.6


def test_formula_front_end(rng, tmp_path):
    g, y, herd, beta, gc = _data(rng)
    n = len(y)
    data = {
        "y": y,
        "herd": herd,  # int -> categorical (prepMatVec.jl:47-51)
        "age": rng.normal(30, 5, n),  # float -> centered
    }
    spec = parse_formula(
        "y ~ 1 + herd + age + SNP(geno)",
        data,
        priors={"geno": ng.BayesC(0.3, 0.05, estimatePi=True)},
        genotypes={"geno": g},
        block_size=16,
    )
    assert [t.name for t in spec.fixed] == ["1", "herd", "age"] or spec.fixed[0].name == "intercept"
    assert spec.fixed[1].n_col == 2  # 3 levels dummy-coded
    plan, state = ng.assemble(spec)
    assert plan.markers[0].method == "BayesC"
    res = run_lmem(spec, 100, 40, 10, out_folder=None, seed=0)
    assert np.isfinite(res.draws["varE"]).all()


def test_formula_random_and_hints(rng):
    g, y, herd, beta, gc = _data(rng)
    data = {"y": y, "herd": herd}
    spec = parse_formula(
        "y ~ 1 + (1|herd) + SNP(geno)",
        data,
        priors={"herd": ng.Random("I", 0.5), "geno": ng.BayesPR(9999, 0.04)},
        genotypes={"geno": g},
        block_size=16,
    )
    assert len(spec.random) == 1
    assert spec.random[0].levels == [1, 2, 3]
    plan, _ = ng.assemble(spec)
    assert plan.random[0].q == 3


def test_formula_gblup_path(rng):
    g, y, herd, beta, gc = _data(rng, n=60)
    spec = parse_formula(
        "y ~ 1 + SNP(geno)",
        {"y": y},
        priors={"geno": ng.Random("G", 0.3)},
        genotypes={"geno": g},
    )
    assert len(spec.markers) == 0
    assert len(spec.random) == 1 and spec.random[0].structure_label == "G"
    plan, state = ng.assemble(spec)
    assert plan.random[0].q == 60


def test_formula_pedigree(rng, tmp_path):
    # small pedigree: 2 founders + 4 offspring, phenotypes on all 6
    ped_file = tmp_path / "ped.txt"
    ped_file.write_text(
        "id sire dam\na 0 0\nb 0 0\nc a b\nd a b\ne a c\nf d c\n"
    )
    ids = ["a", "b", "c", "d", "e", "f"]
    y = rng.normal(0, 1, 6)
    spec = parse_formula(
        "y ~ 1 + PED(ID)",
        {"y": y, "ID": np.array(ids)},
        priors={"ID": ng.Random("A", 0.5)},
        path2ped=str(ped_file),
    )
    assert len(spec.random) == 1
    assert spec.random[0].ivstr.shape == (6, 6)
    plan, state = ng.assemble(spec)
    res = run_lmem(spec, 100, 20, 10, out_folder=None)
    assert res.draws["uID"].shape[1] == 6


def test_rhat_ess_diagnostics(rng):
    chains = rng.normal(0, 1, (4, 200, 3))
    r = split_rhat(chains)
    assert np.all(r < 1.05)
    e = ess_bulk(chains)
    assert np.all(e > 100)
    # a stuck chain inflates rhat
    bad = chains.copy()
    bad[0] += 5.0
    assert split_rhat(bad)[0] > 1.5


def test_model_card_and_lv_formula(rng):
    """Model card spells out substituted defaults; BayesLV accepts a
    variance-model formula string + covariate table (runTime.jl:133,
    design via mme.jl:426)."""
    import nextgp_tpu as ng
    from nextgp_tpu.api.formula import build_lv_design

    n, p = 40, 32
    g = rng.integers(0, 3, (n, p)).astype(float)
    y = rng.normal(0, 1, n)
    table = {"x1": rng.normal(0, 1, p), "grp": rng.integers(0, 2, p)}
    C, labels = build_lv_design("1 + x1 + grp", table)
    assert C.shape == (p, 3) and labels[0] == "intercept"
    np.testing.assert_array_equal(C[:, 0], np.ones(p))
    np.testing.assert_array_equal(C[:, 1], table["x1"])  # raw, not centered

    lv = ng.BayesLV(0.01, "1 + x1", 0.5, covariate_table=table)
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        markers=[
            ng.MarkerTerm("M", ng.from_array(g), lv),
            ng.MarkerTerm("M2", ng.from_array(g), None),  # default prior
        ],
        block_size=8,
    )
    plan, state = ng.assemble(spec)
    assert plan.markers[0].n_lv_cov == 2
    # the formula-built design equals the prebuilt-matrix design
    C2, _ = build_lv_design("1 + x1", table)
    lv2 = ng.BayesLV(0.01, C2, 0.5)
    spec2 = ng.ModelSpec(
        y=y, fixed=[ng.FixedTerm("int", np.ones(n))],
        markers=[ng.MarkerTerm("M", ng.from_array(g), lv2),
                 ng.MarkerTerm("M2", ng.from_array(g), None)],
        block_size=8,
    )
    plan2, state2 = ng.assemble(spec2)
    np.testing.assert_array_equal(
        np.asarray(state.markers[0].lv_design), np.asarray(state2.markers[0].lv_design)
    )

    card = ng.model_card(spec, plan)
    assert "BayesLV" in card and "default BayesPR" in card
    assert f"n = {n}" in card and "residual: Random('I', 100.0)" in card


@pytest.mark.parametrize("n_chain,n_burn,n_thin", [(23, 5, 3), (20, 7, 4), (16, 3, 2)])
def test_burnin_not_divisible_by_thin(rng, n_chain, n_burn, n_thin):
    """Kept iterations must equal the reference rule
    (burn+thin):thin:chain (samplers.jl:26) even when n_burn % n_thin != 0:
    remainder burn sweeps run before the kept loop, so the k-th kept draw is
    sweep n_burn + (k+1)*n_thin — verified against a manual sweep-by-sweep
    chain from the same counter-based keys."""
    import jax

    from nextgp_tpu.engine.sweep import collect_sample, make_sweep

    g, y, herd, beta, gc = _data(rng, n=60, p=32)
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(len(y)))],
        markers=[ng.MarkerTerm("M1", ng.from_array(g), ng.BayesC(0.2, 0.05))],
        block_size=16,
    )
    res = run_lmem(spec, n_chain=n_chain, n_burn=n_burn, n_thin=n_thin,
                   out_folder=None, seed=7)
    kept = [s for s in range(n_burn + n_thin, n_chain + 1, n_thin)]
    assert res.draws["varE"].shape[0] == len(kept)
    assert int(np.asarray(res.state.sweep_index)) == kept[-1]

    plan, state = ng.assemble(spec)
    sweep = jax.jit(make_sweep(plan))
    key = jax.random.key(7)
    manual = []
    for s in range(1, kept[-1] + 1):
        state = sweep(state, key)
        if s in kept:
            manual.append(float(collect_sample(state, plan)["varE"]))
    np.testing.assert_allclose(
        np.asarray(res.draws["varE"]).ravel(), np.asarray(manual), rtol=1e-6)


def test_run_lmem_corr_markers_outputs(rng, tmp_path):
    """run_lmem with a correlated marker tuple streams reference-layout
    files with per-set SNP-id headers and a flattened region-covariance
    file (mme.jl:448-489 output surface)."""
    from nextgp_tpu.api.spec import CorrMarkerTerm

    n, p = 50, 24
    g1 = rng.integers(0, 3, (n, p)).astype(float)
    g2 = rng.integers(0, 3, (n, p)).astype(float)
    y = rng.normal(0, 1, n)
    v = np.array([[0.02, 0.005], [0.005, 0.015]])
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        corr_markers=[CorrMarkerTerm(
            ("M1", "M2"), (ng.from_array(g1), ng.from_array(g2)),
            ng.BayesPR(9999, v))],
        block_size=8,
    )
    out = str(tmp_path / "out")
    res = run_lmem(spec, n_chain=40, n_burn=10, n_thin=5, out_folder=out, seed=2)
    assert res.draws["betaM1"].shape == (6, p)
    b1 = read_samples("betaM1", out)
    b2 = read_samples("betaM2", out)
    vv = read_samples("varM1_M2", out)
    assert b1.shape == (6, p) and b2.shape == (6, p)
    assert vv.shape == (6, 4)  # 1 region x 2x2 covariance flattened
    with open(tmp_path / "out" / "varM1_M2Out") as fh:
        assert fh.readline().split("\t")[0] == "reg1_1_1"


def test_run_lmem_writes_group_info(rng, tmp_path):
    """Mapped BayesPR runs emit groupInfo_<set>.txt during setup as the
    reference does (prep2RegionData, misc.jl:209), with chromosome labels
    as groupID for r=99."""
    n, p = 40, 12
    g = rng.integers(0, 3, (n, p)).astype(float)
    y = rng.normal(0, 1, n)
    chrs = np.r_[np.full(6, 3), np.full(6, 7)]
    md = ng.from_array(g, chr_ids=chrs)
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        markers=[ng.MarkerTerm("M", md, ng.BayesPR(99, 0.05))],
        block_size=8,
    )
    out = str(tmp_path / "out")
    run_lmem(spec, n_chain=10, n_burn=2, n_thin=2, out_folder=out, seed=0)
    fn = os.path.join(out, "groupInfo_M.txt")
    assert os.path.exists(fn)
    rows = [ln.split("\t") for ln in open(fn).read().strip().splitlines()[1:]]
    assert len(rows) == p and rows[0][3] == "3" and rows[-1][3] == "7"


def test_run_chains_writes_group_info(rng, tmp_path):
    """Multi-chain runs emit groupInfo files too (ADVICE r4: the chains>1
    CLI path used to skip _write_group_infos)."""
    from nextgp_tpu.runtime import run_chains

    n, p = 30, 12
    g = rng.integers(0, 3, (n, p)).astype(float)
    y = rng.normal(0, 1, n)
    chrs = np.r_[np.full(6, 1), np.full(6, 2)]
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        markers=[ng.MarkerTerm("M", ng.from_array(g, chr_ids=chrs),
                               ng.BayesPR(99, 0.05))],
        block_size=4,
    )
    out = str(tmp_path / "out")
    run_chains(spec, n_chains=2, n_chain=8, n_burn=2, n_thin=2,
               out_folder=out, vshards=1)
    assert os.path.exists(os.path.join(out, "groupInfo_M.txt"))


def test_dead_summary_stats_warn(rng):
    """SummaryStatistics attached to anything but single-column fixed
    effects or marker sets warn: the reference stores Z offsets
    (mme.jl:201-204) that its sampleU never reads — dead code mirrored
    here, but surfaced instead of silent."""
    import warnings

    n, p = 20, 8
    g = rng.integers(0, 3, (n, p)).astype(float)
    zmat = (rng.integers(0, 3, n)[:, None] == np.arange(3)).astype(float)
    spec = ng.ModelSpec(
        y=rng.normal(0, 1, n),
        fixed=[ng.FixedTerm("int", np.ones(n))],
        random=[ng.RandomTerm("grp", zmat, prior=ng.Random("I", 0.5))],
        markers=[ng.MarkerTerm("M", ng.from_array(g), ng.BayesPR(9999, 0.05))],
        summary_stats={"grp": ng.SummaryStatistics(np.zeros(3), np.ones(3))},
        block_size=8,
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ng.assemble(spec)
    assert any("not consumed" in str(x.message) for x in w)
