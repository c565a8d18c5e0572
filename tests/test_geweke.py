"""Geweke (2004) joint-distribution test for the Gibbs engine.

Marginal-conditional simulator: draw (theta, y) from the prior + likelihood
directly. Successive-conditional simulator: alternate our engine's sweep
(theta | y) with a fresh likelihood draw (y | theta). If the engine samples
the correct conditionals, both simulators target the same joint, so the
moments of any function of theta must agree (z-test with MCMC-aware
standard errors).

Model: y = 1 mu + M beta + e, ridge prior (BayesPR 9999) with FIXED
variances (var_e, var_beta held at truth) so the conditional structure is
exactly Normal — sharp moments, no heavy-tailed variance draws.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nextgp_tpu as ng
from nextgp_tpu.utils import replace

N_IND, N_SNP = 12, 8
VAR_E, VAR_B = 1.0, 0.05
N_DRAWS = 4000


@pytest.fixture(scope="module")
def model(rng=None):
    r = np.random.default_rng(77)
    g = r.integers(0, 3, (N_IND, N_SNP)).astype(float)
    y0 = r.normal(0, 1, N_IND)
    # no fixed effects: the engine's fixed effects are flat-prior, which has
    # no marginal-conditional counterpart (the joint would be improper)
    spec = ng.ModelSpec(
        y=y0,
        markers=[ng.MarkerTerm("M", ng.from_array(g), ng.BayesPR(9999, VAR_B))],
        block_size=8,
    )
    plan, state = ng.assemble(spec, use_pallas=False)
    gc = np.asarray(state.markers[0].mt[0]).T.astype(float) - np.asarray(
        state.markers[0].center.reshape(-1)
    )
    return plan, state, gc[:, :N_SNP]


def _freeze_variances(st):
    """Pin var_e / var_beta at truth (they are redrawn by the sweep; reset)."""
    st = replace(st, e=replace(st.e, var_e=jnp.asarray(VAR_E, st.ycorr.dtype)))
    ms = st.markers[0]
    st = replace(st, markers=(replace(ms, var_beta=jnp.full_like(ms.var_beta, VAR_B)),))
    return st


def _set_y(st, y):
    """Install a fresh response; ycorr = y - mu - M beta for current params."""
    dtype = st.ycorr.dtype
    y = jnp.asarray(y, dtype)
    ms = st.markers[0]
    mt = ms.mt.reshape(-1, N_IND).astype(dtype)  # (p_pad, n)
    cen = ms.center.reshape(-1)
    mbeta = ms.beta @ mt - jnp.dot(ms.beta, cen)
    return replace(st, y=y, ycorr=y - mbeta)


def test_geweke_joint(model):
    plan, state0, gc = model
    sweep = jax.jit(ng.make_sweep(plan))
    r = np.random.default_rng(123)

    # ---- marginal-conditional: exact prior/likelihood draws
    beta_m = r.normal(0, np.sqrt(VAR_B), (N_DRAWS, N_SNP))
    g1_m = beta_m.sum(axis=1)  # test function 1: sum of effects
    g2_m = (beta_m**2).sum(axis=1)  # test function 2: sum of squares

    # ---- successive-conditional: engine sweep + likelihood refresh
    st = _freeze_variances(state0)
    g1_s, g2_s = [], []
    key = jax.random.key(0)
    for it in range(N_DRAWS // 4):
        # y | theta
        beta = np.asarray(st.markers[0].beta[:N_SNP])
        y = gc @ beta + r.normal(0, np.sqrt(VAR_E), N_IND)
        st = _set_y(st, y)
        # theta | y (fix variances after the sweep redraws them)
        st = _freeze_variances(sweep(st, key))
        b = np.asarray(st.markers[0].beta[:N_SNP])
        g1_s.append(b.sum())
        g2_s.append((b**2).sum())
    g1_s = np.asarray(g1_s)
    g2_s = np.asarray(g2_s)

    def zstat(a, b):
        # spectral variance of the (autocorrelated) successive chain
        def se2(x):
            x = x - x.mean()
            n = len(x)
            var = x.var()
            for lag in range(1, min(50, n // 4)):
                c = np.dot(x[:-lag], x[lag:]) / n
                if c <= 0:
                    break
                var += 2 * c
            return var / n

        return (a.mean() - b.mean()) / np.sqrt(a.var() / len(a) + se2(b))

    z1 = zstat(g1_m, g1_s)
    z2 = zstat(g2_m, g2_s)
    assert abs(z1) < 4.0, f"Geweke z (sum beta) = {z1:.2f}"
    assert abs(z2) < 4.0, f"Geweke z (sum beta^2) = {z2:.2f}"
