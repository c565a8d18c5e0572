"""Replay the reference's four worked docs examples end-to-end.

The reference ships no tests; its executable specification is the worked
examples under /root/reference/docs/src (SURVEY.md §4). Each section below
mirrors one of them through this framework's formula front-end with the
same model, hints, blocking and priors, and asserts the behavior the
reference documents:

  1. Example.md        fixed-effects-only — posterior means match lm()/OLS
                       (docs/src/Example/Example.md:120-163)
  2. PBLUP.md          pedigree BLUP, PED(ID) + PED(Dam) + (1|Dam), blocked
                       fixed effects; the resolved df/scale table must equal
                       the reference's printed analysis summary
                       (docs/src/PBLUP/PBLUP.md:52-121: df 4, scales
                       75 / 45 / 20 / 175)
  3. MultipleMarkerSets.md  two SNP sets with separate BayesPR(9999) priors
                       + blocked fixed effects (docs lines 21-81)
  4. BayesLV.md        log-linear variance model from a variance formula +
                       covariate table (docs lines 19-56)

Run: JAX_PLATFORMS=cpu python examples/reference_walkthroughs.py
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import nextgp_tpu as ng
from nextgp_tpu.api.formula import parse_formula
from nextgp_tpu.runtime import model_card, run_lmem

rng = np.random.default_rng(20240509)
tmp = tempfile.mkdtemp(prefix="ng_walkthrough_")


def section(title):
    print(f"\n=== {title} " + "=" * max(0, 58 - len(title)))


# ---------------------------------------------------------------- 1. Example
# y ~ 1 + a + b with b categorical {e,f,g}; flat-prior Gibbs posterior means
# must reproduce the lm() coefficients (Example.md fits GLM and compares).
section("Example.md: fixed effects vs OLS")
n = 400
a = rng.normal(0, 1, n)
b = rng.choice(["e", "f", "g"], n)
coef = {"e": 6.0, "f": 7.65, "g": 8.78}
y = -1.39 + 6.87 * a + np.array([coef[v] for v in b]) + rng.normal(0, 1, n)
spec = parse_formula(
    "y ~ 1 + a + b",
    {"y": y, "a": a, "b": b},
    priors={"e": ng.Random("I", 0.01)},  # Example.md: Random([], 0.01)
)
res = run_lmem(spec, n_chain=4000, n_burn=1000, n_thin=5,
               out_folder=os.path.join(tmp, "ex1"))
bhat = res.posterior_mean("b")
# OLS on the same design (the reference compares against GLM's lm())
X = np.column_stack([np.ones(n), a - a.mean(),
                     (b == "f").astype(float), (b == "g").astype(float)])
ols = np.linalg.lstsq(X, y, rcond=None)[0]
err = np.max(np.abs(bhat - ols))
print(f"posterior means  {np.round(bhat, 3)}")
print(f"OLS coefficients {np.round(ols, 3)}")
print(f"max |Gibbs - OLS| = {err:.4f}  (expect < 0.05)")
assert err < 0.05

# ------------------------------------------------------------------ 2. PBLUP
# The exact 14-animal dataset and pedigree from PBLUP.md, with the same
# hints, fixed-effect block and priors.
section("PBLUP.md: exact worked example")
ped_txt = """QGG1 0 0
QGG2 0 0
QGG3 0 0
QGG4 0 0
QGG5 QGG1 QGG2
QGG6 QGG3 QGG2
QGG7 QGG4 QGG6
QGG8 QGG3 QGG5
QGG9 QGG1 QGG6
QGG10 QGG3 QGG2
QGG11 QGG3 QGG7
QGG12 QGG8 QGG7
QGG13 QGG9 QGG2
QGG14 QGG3 QGG6
"""
ped_path = os.path.join(tmp, "pedigreeBase.txt")
with open(ped_path, "w") as fh:
    fh.write(ped_txt)
rows = [  # ID Sire Dam Herds Pen BW  (PBLUP.md data table)
    ("QGG5", "QGG1", "QGG2", 1, 1, 35.0),
    ("QGG6", "QGG3", "QGG2", 1, 2, 20.0),
    ("QGG7", "QGG4", "QGG6", 1, 2, 25.0),
    ("QGG8", "QGG3", "QGG5", 1, 1, 40.0),
    ("QGG9", "QGG1", "QGG6", 2, 1, 42.0),
    ("QGG10", "QGG3", "QGG2", 2, 2, 22.0),
    ("QGG11", "QGG3", "QGG7", 2, 2, 35.0),
    ("QGG12", "QGG8", "QGG7", 3, 2, 34.0),
    ("QGG13", "QGG9", "QGG2", 3, 1, 20.0),
    ("QGG14", "QGG3", "QGG6", 3, 2, 40.0),
]
data = {
    "ID": np.array([r[0] for r in rows]),
    "Dam": np.array([r[2] for r in rows]),
    "Herds": np.array([r[3] for r in rows]),
    "Pen": np.array([r[4] for r in rows]),
    "BW": np.array([r[5] for r in rows]),
}
spec = parse_formula(
    "BW ~ Herds + Pen + PED(ID) + PED(Dam) + (1|Dam)",
    data,
    priors={
        "ID": ng.Random("A", 150.0),
        "Dam": ng.Random("A", 90.0),
        "1|Dam": ng.Random("I", 40.0),
        "e": ng.Random("I", 350.0),
    },
    hints={"Pen": "full_dummy", "Herds": "full_dummy"},
    path2ped=ped_path,
    blocks=[("Herds", "Pen")],
)
plan, state = ng.assemble(spec)
card = model_card(spec, plan, state)
print(card)
# the reference's printed analysis summary: df 4.0 everywhere, scales
# v*(df-2)/df = 75 / 45 / 20 (ID / Dam / 1|Dam) and 175 for e
scales = [float(np.asarray(s.scale)) for s in state.random]
assert scales == [75.0, 45.0, 20.0], scales
assert float(np.asarray(state.e.scale)) == 175.0
assert all(rp.df == 4.0 for rp in plan.random) and plan.e_df == 4.0
res = run_lmem(spec, n_chain=20000, n_burn=2000, n_thin=10,
               out_folder=os.path.join(tmp, "pblup"))
var_means = {nm: float(res.posterior_mean(f"varU{nm}"))
             for nm in ("ID", "Dam")}
print(f"posterior variance means: {var_means}, "
      f"varE {float(res.posterior_mean('varE')):.1f}")
assert all(np.isfinite(v) and v > 0 for v in var_means.values())

# ------------------------------------------------- 3. MultipleMarkerSets.md
# y ~ 1 + lact + herd + dim + wilmink + SNP(A) + SNP(B) with the two sets
# under separate whole-genome BayesPR priors and (1, lact, herd) blocked.
section("MultipleMarkerSets.md: two marker sets")
n, pA, pB = 300, 189, 1024
gA = rng.integers(0, 3, (n, pA)).astype(float)
gB = rng.integers(0, 3, (n, pB)).astype(float)
lact = rng.integers(1, 7, n)
herd = rng.integers(1, 7, n)
dim = rng.normal(150, 30, n)
wilmink = np.exp(-0.05 * dim)
sig = (gB - gB.mean(0)) @ rng.normal(0, 0.18, pB)
y = 30 + 0.01 * (dim - dim.mean()) + sig + rng.normal(0, 2.0, n)
spec = parse_formula(
    "y ~ 1 + lact + herd + dim + wilmink + SNP(A) + SNP(B)",
    {"y": y, "lact": lact, "herd": herd, "dim": dim, "wilmink": wilmink},
    priors={
        "A": ng.BayesPR(9999, 0.04),
        "B": ng.BayesPR(9999, 0.04),
        "e": ng.Random("I", 2500.0),
    },
    hints={"lact": "full_dummy", "herd": "full_dummy"},
    blocks=[("intercept", "lact", "herd")],
    genotypes={"A": gA, "B": gB},
    block_size=64,
)
plan, state = ng.assemble(spec)
print(model_card(spec, plan, state))
assert [mp.name for mp in plan.markers] == ["A", "B"]
assert all(mp.n_regions == 1 for mp in plan.markers)  # 9999 = one region
res = run_lmem(spec, n_chain=1500, n_burn=300, n_thin=5,
               out_folder=os.path.join(tmp, "mms"))
ebv = (gB - gB.mean(0)) @ res.posterior_mean("betaB")
cB = np.corrcoef(ebv, sig)[0, 1]
print(f"EBV corr (set B, true signal) = {cB:.3f}  (expect > 0.8)")
assert cB > 0.8, cB

# ------------------------------------------------------------- 4. BayesLV.md
# Marker variance model log(sigma2_j) = c0 + c1 x1 + c2 x2 + zeta_j from a
# variance formula + per-SNP covariate table.
section("BayesLV.md: log-linear variance formula")
n, p = 250, 256
g = rng.integers(0, 3, (n, p)).astype(float)
x1 = rng.normal(0, 1, p)
x2 = rng.normal(0, 1, p)
beta = rng.normal(0, np.exp(0.5 * (-6.0 + 1.0 * x1)), p)
y = 10.0 + (g - g.mean(0)) @ beta + rng.normal(0, 1, n)
spec = parse_formula(
    "y ~ 1 + SNP(M)",
    {"y": y},
    priors={
        "M": ng.BayesLV(0.001, "1 + x1 + x2", 0.01,
                        covariate_table={"x1": x1, "x2": x2}),
        "e": ng.Random("I", 150.0),
    },
    genotypes={"M": g},
    block_size=64,
)
plan, state = ng.assemble(spec)
print(model_card(spec, plan, state))
assert plan.markers[0].method == "BayesLV" and plan.markers[0].n_lv_cov == 3
res = run_lmem(spec, n_chain=1200, n_burn=300, n_thin=5,
               out_folder=os.path.join(tmp, "lv"))
c = res.posterior_mean("cM")
print(f"posterior variance-model coefficients c = {np.round(c, 3)} "
      f"(x1 simulated with positive effect: c[1] > c[2])")
assert np.isfinite(c).all()

print("\nALL WALKTHROUGHS OK")
