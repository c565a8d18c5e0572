"""Generate the committed reference-equivalence fixture (deterministic).

A small BayesPR(9999) whole-genome problem both implementations can read:
  fixture/genotypes.txt  space-delimited headerless 0/1/2 dosages
                         (the reference's genotype format, prepMatVec.jl:116)
  fixture/pheno.csv      ID,y
  fixture/truth.csv      per-locus simulated effects (for reporting only)

Run once; outputs are committed so the harness is reproducible without
re-simulation. Scale: 300 x 1200 — big enough for a stable EBV ranking,
small enough to commit and for the single-threaded reference to chew
through quickly.
"""
import os

import numpy as np

HERE = os.path.dirname(__file__)
N, P, NQTL, SEED = 300, 1200, 60, 20240509


def main():
    rng = np.random.default_rng(SEED)
    g = rng.integers(0, 3, (N, P))
    beta = np.zeros(P)
    qtl = rng.choice(P, NQTL, replace=False)
    beta[qtl] = rng.normal(0.0, 0.35, NQTL)
    gc = g - g.mean(axis=0)
    signal = gc @ beta
    h2 = 0.5
    ve = signal.var() * (1 - h2) / h2
    y = 10.0 + signal + rng.normal(0.0, np.sqrt(ve), N)

    fx = os.path.join(HERE, "fixture")
    os.makedirs(fx, exist_ok=True)
    with open(os.path.join(fx, "genotypes.txt"), "w") as fh:
        for row in g:
            fh.write(" ".join(map(str, row)) + "\n")
    with open(os.path.join(fx, "pheno.csv"), "w") as fh:
        fh.write("ID,y\n")
        for i, v in enumerate(y):
            fh.write(f"ind{i + 1},{v:.17g}\n")
    with open(os.path.join(fx, "truth.csv"), "w") as fh:
        fh.write("beta\n")
        for v in beta:
            fh.write(f"{v:.17g}\n")
    write_extras(rng, fx, qtl)
    print(f"fixture written: {N} x {P}, h2={h2}, varE={ve:.3f}")


def write_extras(rng, fx, qtl):
    """Per-method extras: annotation matrix (BayesRCpi/RCplus) and a
    variance-model covariate (BayesLV). Deterministic; committed."""
    # 3 annotation classes; every SNP in class 1, QTL enriched in class 2
    annot = np.zeros((P, 3), np.int64)
    annot[:, 0] = 1
    annot[qtl, 1] = 1
    extra = rng.choice(P, P // 10, replace=False)
    annot[extra, 2] = 1
    np.savetxt(os.path.join(fx, "annot.txt"), annot, fmt="%d")
    # one standard-normal variance-model covariate per SNP
    cov = rng.normal(0.0, 1.0, P)
    np.savetxt(os.path.join(fx, "lv_cov.txt"), cov, fmt="%.17g")
    # heteroscedastic residual weights (the "D" structure, mme.jl:71-75)
    w = rng.uniform(0.5, 2.0, N)
    np.savetxt(os.path.join(fx, "weights.txt"), w, fmt="%.17g")
    # iid grouping factor for the (1|grp) random-effect variant
    grp = rng.integers(0, 20, N)
    np.savetxt(os.path.join(fx, "groups.txt"), grp, fmt="%d")


if __name__ == "__main__":
    main()
