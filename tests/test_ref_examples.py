"""The reference's PBLUP worked example, end-to-end through the formula
front-end, with the exact data of /root/reference/docs/src/PBLUP/PBLUP.md
(phenotypes lines 12-23, pedigree lines 31-49, model lines 52-88).

The docs publish no posterior summaries, but the printed analysis-summary
table (PBLUP.md:106-121) gives exact resolved hyperparameters to check:
df = 4.0 for every random effect and scale = v*(df-2)/df, i.e.
ID: 75.0, Dam: 45.0, 1|Dam: 20.0, e: 175.0.
"""
import os

import numpy as np
import pytest

import nextgp_tpu as ng
from nextgp_tpu.api.formula import parse_formula

PHENO = {
    "ID": np.array(["QGG5", "QGG6", "QGG7", "QGG8", "QGG9",
                    "QGG10", "QGG11", "QGG12", "QGG13", "QGG14"]),
    "Sire": np.array(["QGG1", "QGG3", "QGG4", "QGG3", "QGG1",
                      "QGG3", "QGG3", "QGG8", "QGG9", "QGG3"]),
    "Dam": np.array(["QGG2", "QGG2", "QGG6", "QGG5", "QGG6",
                     "QGG2", "QGG7", "QGG7", "QGG2", "QGG6"]),
    "Herds": np.array([1, 1, 1, 1, 2, 2, 2, 3, 3, 3]),
    "Pen": np.array([1, 2, 2, 1, 1, 2, 2, 2, 1, 2]),
    "BW": np.array([35.0, 20.0, 25.0, 40.0, 42.0, 22.0, 35.0, 34.0, 20.0, 40.0]),
}

PED = """QGG1 0 0
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


@pytest.fixture
def pblup_docs(tmp_path):
    ped_path = tmp_path / "pedigreeBase.txt"
    ped_path.write_text(PED)
    return str(ped_path)


def test_pblup_worked_example(pblup_docs, tmp_path):
    spec = parse_formula(
        "BW ~ Herds + Pen + PED(ID) + PED(Dam) + (1|Dam)",
        PHENO,
        priors={
            "ID": ng.Random("A", 150.0),
            "Dam": ng.Random("A", 90.0),
            "1|Dam": ng.Random("I", 40.0),
            "e": ng.Random("I", 350.0),
        },
        hints={"Pen": "full_dummy"},  # myHints of PBLUP.md:68-71
        path2ped=pblup_docs,
        blocks=[("Herds", "Pen")],
    )
    # input summary (PBLUP.md:96-103): Herds 2 dummy cols, Pen 2 full cols,
    # PED terms over 14 animals, 1|Dam over the 4 distinct dams
    plan, state = ng.assemble(spec)
    blk = plan.fixed[0]
    assert blk.name == ("Herds", "Pen") and blk.k == 4  # 2 (dummy) + 2 (full)
    assert [rp.q for rp in plan.random] == [14, 14, 4]

    # analysis summary (PBLUP.md:112-121): df and scale resolutions
    assert all(rp.df == 4.0 for rp in plan.random)
    assert [float(rs.scale) for rs in state.random] == [75.0, 45.0, 20.0]
    assert plan.e_df == 4.0 and float(state.e.scale) == 175.0

    # the run itself: short chain through run_lmem with the reference's
    # kept-iteration rule and output-file layout (mme.jl:541-596)
    out = str(tmp_path / "outMCMC")
    res = ng.run_lmem(spec, n_chain=600, n_burn=100, n_thin=10, out_folder=out, seed=1)
    files = sorted(os.listdir(out))
    for q in ("bOut", "uIDOut", "uDamOut", "varEOut", "varUIDOut", "varUDamOut"):
        assert q in files, files
    u_id = res.posterior_mean("uID")
    assert u_id.shape == (14,)
    # EBVs center near zero and are finite; varE posterior within a sane
    # band around the simulated-scale prior
    assert np.isfinite(u_id).all()
    ve = res.posterior_mean("varE")
    assert 1.0 < float(ve) < 1000.0

    # BLUP cross-check: at FIXED variance components the posterior mean of
    # (b, u) solves Henderson's MME. Keeping variances near their priors via
    # the long-run average is noisy, so check the model's own consistency:
    # ycorr == BW - X b - Z u exactly at the last draw
    bm = np.asarray(res.state.fixed[0].b)
    x = np.asarray(res.state.fixed[0].x)
    recon = PHENO["BW"] - x @ bm
    for rs in res.state.random:
        z = np.asarray(rs.z)
        recon = recon - z @ np.asarray(rs.u)
    drift = np.abs(np.asarray(res.state.ycorr) - recon).max()
    assert drift < 1e-8
