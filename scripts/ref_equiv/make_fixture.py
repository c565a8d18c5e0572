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
    write_mme_extras(fx, gc)
    write_grn_fixture(fx)
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


def write_mme_extras(fx, gc1):
    """Composite-model fixture (VERDICT r4 next-item 2): pedigree, record ->
    animal map, per-locus chromosome map, a second genotype panel, summary
    statistics with v = inf entries (the mme.jl:316-322 guard), a blocked
    fixed design, and a composite phenotype carrying marker + additive +
    maternal + fixed signal. Own seed stream so the original fixture files
    stay byte-identical."""
    rng = np.random.default_rng(SEED + 1)
    Q = 60  # pedigree animals, topologically ordered, 12 founders
    sire = np.full(Q, -1, np.int64)
    dam = np.full(Q, -1, np.int64)
    for i in range(12, Q):
        s, d = rng.integers(0, i, 2)
        if s != d:
            sire[i], dam[i] = s, d
    with open(os.path.join(fx, "pedigree.txt"), "w") as fh:
        fh.write("id sire dam\n")
        for i in range(Q):
            s = f"A{sire[i] + 1}" if sire[i] >= 0 else "0"
            d = f"A{dam[i] + 1}" if dam[i] >= 0 else "0"
            fh.write(f"A{i + 1} {s} {d}\n")
    animal = rng.integers(0, Q, N)
    np.savetxt(os.path.join(fx, "animal.txt"), animal, fmt="%d")

    # map: 3 chromosomes x 400 loci (sorted; integer ids 1..3 as the
    # reference's accRegionVec indexing assumes, misc.jl:178-190).
    # map.csv is the reference's map-file format (snpID,snpOrder,chrID —
    # misc.jl:167) for the Julia mirror; map_chr.txt the bare chr vector.
    chr_ids = np.repeat([1, 2, 3], P // 3)
    np.savetxt(os.path.join(fx, "map_chr.txt"), chr_ids, fmt="%d")
    with open(os.path.join(fx, "map.csv"), "w") as fh:
        fh.write("snpID,snpOrder,chrID\n")
        for i, c in enumerate(chr_ids):
            fh.write(f"snp{i + 1},{i + 1},{c}\n")

    # second panel with its own sparse signal
    g2 = rng.integers(0, 3, (N, P))
    with open(os.path.join(fx, "geno2.txt"), "w") as fh:
        for row in g2:
            fh.write(" ".join(map(str, row)) + "\n")
    beta2 = np.zeros(P)
    qtl2 = rng.choice(P, 40, replace=False)
    beta2[qtl2] = rng.normal(0.0, 0.3, 40)

    # summary statistics for M1: noisy per-locus estimates; ~5% of v
    # entries are inf (no information; exercises the Inf/NaN guard)
    truth = np.loadtxt(os.path.join(fx, "truth.csv"), skiprows=1)
    ss_m = truth + rng.normal(0.0, 0.15, P)
    ss_v = rng.uniform(0.05, 0.5, P)
    ss_v[rng.choice(P, P // 20, replace=False)] = np.inf
    np.savetxt(os.path.join(fx, "ss_m.txt"), ss_m, fmt="%.17g")
    np.savetxt(os.path.join(fx, "ss_v.txt"), ss_v, fmt="%.17g")

    # blocked fixed design: sex 0/1 + centered age covariate
    sex = rng.integers(0, 2, N).astype(np.float64)
    age = rng.normal(0.0, 1.0, N)
    age -= age.mean()
    np.savetxt(os.path.join(fx, "sex.txt"), sex, fmt="%d")
    np.savetxt(os.path.join(fx, "age.txt"), age, fmt="%.17g")

    # pedigree-simulated additive values a ~ N(0, A * 1.5) via the
    # recursion a_i = 0.5(a_s + a_d) + mendelian, plus a maternal effect
    # m ~ N(0, 0.8 I) on the dam, correlated with a (rho ~ 0.3)
    va, vm = 1.5, 0.8
    a = np.zeros(Q)
    for i in range(Q):
        if sire[i] >= 0 and dam[i] >= 0:
            a[i] = 0.5 * (a[sire[i]] + a[dam[i]]) + rng.normal(
                0.0, np.sqrt(0.5 * va))
        else:
            a[i] = rng.normal(0.0, np.sqrt(va))
    m_eff = 0.3 * a + rng.normal(0.0, np.sqrt(vm), Q)
    gc2 = g2 - g2.mean(axis=0)
    sig = gc1 @ np.loadtxt(os.path.join(fx, "truth.csv"), skiprows=1)
    sig2 = gc2 @ beta2
    dam_of = dam[animal]  # -1 where unknown
    mat = np.where(dam_of >= 0, m_eff[np.maximum(dam_of, 0)], 0.0)
    y2 = (10.0 + 0.4 * sex + 0.3 * age + sig + sig2 + a[animal] + mat
          + rng.normal(0.0, 1.2, N))
    with open(os.path.join(fx, "pheno_mme.csv"), "w") as fh:
        fh.write("ID,y\n")
        for i, v in enumerate(y2):
            fh.write(f"ind{i + 1},{v:.17g}\n")
    with open(os.path.join(fx, "truth2.csv"), "w") as fh:
        fh.write("beta\n")
        for v in beta2:
            fh.write(f"{v:.17g}\n")


def write_grn_fixture(fx):
    """Small planted GRN problem (GRN.jl surface): G genes, S = 2G SNPs,
    N individuals; Y = inv(I - L1) (mu + L2 Xc + e)."""
    rng = np.random.default_rng(SEED + 2)
    G, S, Nn = 5, 10, 150
    x = rng.integers(0, 3, (S, Nn)).astype(np.float64)
    xc = x - x.mean(axis=1, keepdims=True)
    l1 = np.zeros((G, G))
    l1[1, 0], l1[2, 1], l1[3, 4] = 0.45, -0.35, 0.3
    l2 = np.zeros((G, S))
    for g in range(G):
        l2[g, 2 * g] = rng.normal(0.6, 0.1)
        l2[g, 2 * g + 1] = rng.normal(-0.4, 0.1)
    mu = rng.normal(0.0, 1.0, G)
    e = rng.normal(0.0, 0.5, (G, Nn))
    yy = np.linalg.solve(np.eye(G) - l1, mu[:, None] + l2 @ xc + e)
    np.savetxt(os.path.join(fx, "grn_x.txt"), x, fmt="%d")
    np.savetxt(os.path.join(fx, "grn_y.txt"), yy, fmt="%.17g")
    np.savetxt(os.path.join(fx, "grn_l1_true.txt"), l1, fmt="%.17g")
    np.savetxt(os.path.join(fx, "grn_l2_true.txt"), l2, fmt="%.17g")


if __name__ == "__main__":
    main()
