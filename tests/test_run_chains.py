"""Multi-chain runner: data-parallel chains over the virtual CPU mesh with
built-in split-Rhat/ESS diagnostics."""
import numpy as np

import nextgp_tpu as ng
from nextgp_tpu.runtime import run_chains


def test_run_chains_rhat(rng):
    n, p = 60, 32
    g = rng.integers(0, 3, (n, p)).astype(float)
    y = 1.0 + (g - g.mean(0)) @ rng.normal(0, 0.2, p) + rng.normal(0, 1, n)
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        markers=[ng.MarkerTerm("M", ng.from_array(g), ng.BayesC(0.2, 0.05))],
        block_size=16,
    )
    out = run_chains(
        spec, n_chains=4, n_chain=300, n_burn=100, n_thin=10, seed=5,
        n_shards=2, track=("varE", "betaM"),
    )
    ve = out["draws"]["varE"]
    assert ve.shape == (4, 20)
    # chains differ (independent keys) but target the same posterior
    assert len({round(float(v), 6) for v in ve[:, -1]}) == 4
    rhat = out["rhat"]["varE"]
    assert np.all(np.isfinite(rhat)) and np.all(rhat < 1.5)
    assert out["draws"]["betaM"].shape == (4, 20, p)
    assert np.all(out["ess"]["varE"] > 3)
