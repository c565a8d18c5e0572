"""Independent plain-NumPy oracle for the reference-equivalence harness.

A from-scratch sequential single-site Gibbs chain for EVERY marker method,
written directly against the reference Julia source (cited per sampler) and
deliberately sharing NOTHING with nextgp_tpu: no engine imports, no jax, a
plain `np.random.Generator` instead of the engine's counter-based key
streams. tests/golden_oracle.py replays the engine's own reading of the
Julia draw-for-draw (same RNG streams), so a shared misreading of a
conditional would pass the golden tests silently; THIS oracle can only
agree with the engine in distribution if both implement the same
conditionals, which is what scripts/ref_equiv/run.py gates on (posterior
EBV / PIP / variance agreement over long chains).

Model: y = 1*mu + M beta + e  with residual prior Random("I", v_e) or the
weighted Random(w, v_e) "D" structure (df 4, scale v*(df-2)/df —
/root/reference/src/mme.jl:87-94) and a single marker set under one of the
seven priors. Stage order per sweep follows runSampler!
(/root/reference/src/samplers.jl:31-53): varE -> fixed -> markers. The
min(|diag|)/1e4 ridge jitter applies only to Matrix xpx blocks
(mme.jl:146-150), so the scalar intercept here carries none.
"""
from __future__ import annotations

import numpy as np


def _chisq(rng, df):
    return rng.chisquare(df)


def run_oracle(method, g, y, prior, chain=4000, burn=1000, thin=5, seed=1,
               annot=None, lv_design=None, v_e=1.0, weights=None,
               z_idx=None, z_v=0.5):
    """Run the sequential chain; return posterior summaries.

    prior: dict with keys per method —
      PR/LV: v;  B/C: pi (P(in)), v, estimatePi;  R/RCpi/RCplus: pi (vector),
      class (vector), v, estimatePi;  LV adds varZeta, estimateVarZeta.
    weights: residual "D" weight vector w (mme.jl:71-75: iVarStr = 1/w) —
      weighted varE / xpx / Xp / mpm / Mp; BayesB/C's rrr stays the RAW
      column dot (functions.jl:168,208).
    z_idx: optional (n,) int level assignment for one iid (1|grp) random
      effect, prior Random("I", z_v) — per-level scan of sampleU/sampleZ!
      (functions.jl:57-97, identity structure) + sampleVarU (:498-501),
      stage order varE -> X -> Z -> M (samplers.jl:41-53).
    Returns {"beta_mean", "pip", "var_e_mean", "var_beta_mean", "ebv_mean"
             [, "u_mean", "var_u_mean"]}.
    """
    rng = np.random.default_rng(seed)
    g = np.asarray(g, np.float64)
    y = np.asarray(y, np.float64)
    n, p = g.shape
    mc = g - g.mean(axis=0)
    mcT = np.ascontiguousarray(mc.T)  # (p, n): row j = centered locus j
    d_inv = None if weights is None else 1.0 / np.asarray(weights, np.float64)
    if d_inv is None:
        mcTw = mcT  # Mp rows (mme.jl:299-309)
        mpm = np.einsum("ij,ij->i", mcT, mcT)
    else:
        mcTw = mcT * d_inv[None, :]
        mpm = np.einsum("ij,ij->i", mcT, mcTw)

    # intercept precompute (mme.jl:127-153). NOTE the min(|diag|)/1e4 ridge
    # jitter applies only to Matrix xpx (multi-column blocks) — a scalar
    # intercept xpx is NOT jittered (mme.jl:146-150).
    xpx = float(n) if d_inv is None else float(d_inv.sum())
    xpw = np.ones(n) if d_inv is None else d_inv  # weighted Xp row

    e_df = 4.0
    e_scale = v_e * (e_df - 2.0) / e_df  # mme.jl:87-94
    m_df = 4.0  # scalar v: df = 3 + 1 (mme.jl:492-506)
    v = float(prior["v"])
    m_scale = v * (m_df - 2.0) / m_df

    beta = np.zeros(p)
    b0 = 0.0
    ycorr = y.copy()
    var_e = v_e

    if z_idx is not None:
        z_idx = np.asarray(z_idx, np.int64)
        qlev = int(z_idx.max()) + 1
        u = np.zeros(qlev)
        var_u = float(z_v)
        z_df = 4.0  # 3 + dim(v) (mme.jl:264-272)
        z_scale = z_v * (z_df - 2.0) / z_df
        # zpz = per-level z'z (weighted when D; mme.jl:170-204)
        zw = np.ones(n) if d_inv is None else d_inv
        zpz = np.bincount(z_idx, weights=zw, minlength=qlev)
        s_u = np.zeros(qlev)
        s_var_u = 0.0

    # ---- per-method state (mme.jl:326-446 init rules)
    if method in ("BayesB", "BayesLV"):
        var_beta = np.full(p, v)
    elif method == "BayesPR":
        var_beta = np.array([v])  # one whole-genome region (r=9999)
    elif method in ("BayesC", "BayesR"):
        var_beta = np.array([v])
    elif method in ("BayesRCpi", "BayesRCplus"):
        annot = np.asarray(annot, np.float64)
        n_annot = annot.shape[1]
        var_beta = np.full(n_annot, v)
    else:
        raise ValueError(method)

    if method in ("BayesB", "BayesC"):
        pi_in = float(prior["pi"])
        log_pi = np.log([1.0 - pi_in, pi_in])  # [out, in] (mme.jl:352,364)
        est_pi = bool(prior.get("estimatePi", False))
        delta = np.ones(p, np.int64)
    elif method == "BayesR":
        pi_vec = np.asarray(prior["pi"], np.float64)
        v_class = np.asarray(prior["class"], np.float64)
        log_pi = np.log(pi_vec)
        est_pi = bool(prior.get("estimatePi", False))
        delta = np.ones(p, np.int64)
    elif method in ("BayesRCpi", "BayesRCplus"):
        pi_vec = np.asarray(prior["pi"], np.float64)
        v_class = np.asarray(prior["class"], np.float64)
        log_pi = np.tile(np.log(pi_vec), (n_annot, 1))  # per annot
        est_pi = bool(prior.get("estimatePi", False))
        delta = np.ones(p, np.int64)
        annot_prob = annot / annot.sum(axis=1, keepdims=True)
        annot_nz = [np.flatnonzero(annot[j]) for j in range(p)]
    else:
        delta = np.ones(p, np.int64)

    if method == "BayesLV":
        C = np.asarray(lv_design, np.float64)  # (p, k) variance-model design
        log_var = np.full(p, np.log(v))  # mme.jl:426
        cpc = C.T @ C
        cpc += np.eye(cpc.shape[0]) * np.abs(np.diag(cpc)).min() / 10000.0
        icpc = np.linalg.inv(cpc)  # mme.jl:433-438
        lv_c = rng.uniform(size=C.shape[1])  # rand init (mme.jl:429)
        snp_var_resid = rng.uniform(size=p)  # rand init (mme.jl:430)
        var_zeta = float(prior["varZeta"])
        est_var_zeta = prior.get("estimateVarZeta", False)

    kept = 0
    s_beta = np.zeros(p)
    s_pip = np.zeros(p)
    s_var_e = 0.0
    s_var_b = 0.0
    s_ebv = np.zeros(n)

    for it in range(1, chain + 1):
        # --- varE (functions.jl:523-528; weighted variant sums d_inv*e^2)
        ee = ycorr @ ycorr if d_inv is None else ycorr @ (d_inv * ycorr)
        var_e = (e_df * e_scale + ee) / _chisq(rng, e_df + n)
        ive = 1.0 / var_e

        # --- intercept (functions.jl:39-48, single-column path)
        ycorr += b0
        rhs0 = (xpw @ ycorr) * ive
        lhs0 = xpx * ive
        b0 = rng.normal(rhs0 / lhs0, np.sqrt(1.0 / lhs0))
        ycorr -= b0

        # --- iid random effect (functions.jl:57-97 identity structure:
        # full restore, Yi precomputed once, per-level scan; sampleVarU)
        if z_idx is not None:
            ycorr += u[z_idx]
            yi = np.bincount(z_idx, weights=ycorr * zw, minlength=qlev) * ive
            ivu = 1.0 / var_u
            for i in range(qlev):
                lhs_u = zpz[i] * ive + ivu
                u[i] = rng.normal(yi[i] / lhs_u, np.sqrt(1.0 / lhs_u))
            ycorr -= u[z_idx]
            var_u = (z_scale * z_df + u @ u) / _chisq(rng, z_df + qlev)

        # --- marker set
        if method == "BayesPR":
            # functions.jl:118-137, one region
            ivb = 1.0 / var_beta[0]
            for j in range(p):
                ycorr += beta[j] * mcT[j]
                rhs = (mcTw[j] @ ycorr) * ive
                lhs = mpm[j] * ive + ivb
                beta[j] = rng.normal(rhs / lhs, np.sqrt(1.0 / lhs))
                ycorr -= beta[j] * mcT[j]
            var_beta[0] = (m_scale * m_df + beta @ beta) / _chisq(rng, m_df + p)

        elif method in ("BayesB", "BayesC"):
            # functions.jl:157-236
            common = method == "BayesC"
            n_in = 0
            for j in range(p):
                vb = var_beta[0] if common else var_beta[j]
                ycorr += beta[j] * mcT[j]
                rrr = mcT[j] @ ycorr  # raw dot, NOT /varE (functions.jl:168)
                v0 = mpm[j] * var_e
                v1 = mpm[j] ** 2 * vb + v0
                ld0 = -0.5 * (np.log(v0) + rrr**2 / v0) + log_pi[0]
                ld1 = -0.5 * (np.log(v1) + rrr**2 / v1) + log_pi[1]
                p1 = 1.0 / (1.0 + np.exp(ld0 - ld1))
                if rng.uniform() < p1:
                    delta[j] = 1
                    n_in += 1
                    # reference recomputes via the (weighted) Mp row; equals
                    # rrr*ive only in the unweighted case
                    rhs = (rrr if d_inv is None else mcTw[j] @ ycorr) * ive
                    with np.errstate(divide="ignore"):
                        lhs = mpm[j] * ive + (1.0 / vb if vb > 0 else np.inf)
                    if np.isinf(lhs):
                        beta[j] = 0.0  # N(0, 0) limit
                    else:
                        beta[j] = rng.normal(rhs / lhs, np.sqrt(1.0 / lhs))
                    ycorr -= beta[j] * mcT[j]
                    if not common:  # per-locus redraw (functions.jl:183)
                        var_beta[j] = (m_scale * m_df + beta[j] ** 2) / _chisq(
                            rng, m_df + 1.0)
                else:
                    beta[j] = 0.0
                    delta[j] = 0
                    if not common:
                        var_beta[j] = 0.0
            if common:
                var_beta[0] = (m_scale * m_df + beta @ beta) / _chisq(
                    rng, m_df + n_in)
            if est_pi:  # Beta(nIn+1, nOut+1) (functions.jl:531-533)
                pin = rng.beta(n_in + 1.0, p - n_in + 1.0)
                log_pi = np.log([1.0 - pin, pin])

        elif method == "BayesR":
            # functions.jl:238-289
            K = len(v_class)
            varc = var_beta[0] * v_class
            n_cls = np.zeros(K, np.int64)
            n_nz = 0
            sum_s = 0.0
            for j in range(p):
                ycorr += beta[j] * mcT[j]
                rhs = (mcTw[j] @ ycorr) * ive
                lhs_v = np.zeros(K)
                logl = np.empty(K)
                for k in range(K):
                    if varc[k] == 0.0:
                        logl[k] = log_pi[k]
                    else:
                        lhs_v[k] = mpm[j] * ive + 1.0 / varc[k]
                        logl[k] = -0.5 * (np.log(varc[k] * lhs_v[k])
                                          - rhs**2 / lhs_v[k]) + log_pi[k]
                # max-stabilized (distribution-invariant; the raw reference
                # exp overflows f64 when rhs^2/lhs ~ 1500+ on strong loci)
                probs = np.exp(logl - logl.max())
                probs /= probs.sum()
                cls = int(np.searchsorted(np.cumsum(probs), rng.uniform()))
                cls = min(cls, K - 1)
                delta[j] = cls + 1
                n_cls[cls] += 1
                if varc[cls] != 0.0:
                    n_nz += 1
                    beta[j] = rng.normal(rhs / lhs_v[cls],
                                         np.sqrt(1.0 / lhs_v[cls]))
                    ycorr -= beta[j] * mcT[j]
                    sum_s += beta[j] ** 2 / v_class[cls]
                else:
                    beta[j] = 0.0
            var_beta[0] = (m_scale * m_df + sum_s) / _chisq(rng, m_df + n_nz)
            if est_pi:  # Dirichlet(counts+1) (functions.jl:536-538)
                pi_new = rng.dirichlet(n_cls + 1.0)
                log_pi = np.log(pi_new)

        elif method == "BayesRCpi":
            # functions.jl:291-360
            K = len(v_class)
            n_cls = np.zeros((n_annot, K), np.int64)
            n_nz = np.zeros(n_annot, np.int64)
            sum_s = np.zeros(n_annot)
            for j in range(p):
                nz = annot_nz[j]
                ycorr += beta[j] * mcT[j]
                rhs = (mcTw[j] @ ycorr) * ive
                lhs_av = np.zeros((n_annot, K))
                logl_av = np.full((n_annot, K), -np.inf)
                for a in nz:
                    for k in range(K):
                        vak = var_beta[a] * v_class[k]
                        if vak == 0.0:
                            logl_av[a, k] = log_pi[a, k]
                        else:
                            lhs_av[a, k] = mpm[j] * ive + 1.0 / vak
                            logl_av[a, k] = (
                                -0.5 * (np.log(vak * lhs_av[a, k])
                                        - rhs**2 / lhs_av[a, k]) + log_pi[a, k])
                # one global max-stabilization: scales every grid cell by a
                # constant, so both the annotation CDF and the class CDF are
                # unchanged (raw reference exp overflows f64 on strong loci)
                explogl = np.exp(logl_av - logl_av[np.isfinite(logl_av)].max())
                pa = annot_prob[j] * explogl.sum(axis=1)
                pa = pa / pa.sum()
                a_sel = int(np.searchsorted(np.cumsum(pa), rng.uniform()))
                a_sel = min(a_sel, n_annot - 1)
                # per-locus annotation prob redraw (functions.jl:541-544)
                inp = annot[j, nz].copy()
                inp[np.flatnonzero(nz == a_sel)[0]] += 1.0
                annot_prob[j, nz] = rng.dirichlet(inp)
                pv = explogl[a_sel] / explogl[a_sel].sum()
                cls = int(np.searchsorted(np.cumsum(pv), rng.uniform()))
                cls = min(cls, K - 1)
                delta[j] = cls + 1
                n_cls[a_sel, cls] += 1
                vak = var_beta[a_sel] * v_class[cls]
                if vak != 0.0:
                    n_nz[a_sel] += 1
                    beta[j] = rng.normal(rhs / lhs_av[a_sel, cls],
                                         np.sqrt(1.0 / lhs_av[a_sel, cls]))
                    ycorr -= beta[j] * mcT[j]
                    sum_s[a_sel] += beta[j] ** 2 / v_class[cls]
                else:
                    beta[j] = 0.0
            for a in range(n_annot):
                var_beta[a] = (m_scale * m_df + sum_s[a]) / _chisq(
                    rng, m_df + n_nz[a])
            if est_pi:
                for a in range(n_annot):
                    log_pi[a] = np.log(rng.dirichlet(n_cls[a] + 1.0))

        elif method == "BayesRCplus":
            # functions.jl:362-419: locus effect = SUM of per-annotation draws
            K = len(v_class)
            n_cls = np.zeros((n_annot, K), np.int64)
            n_nz = np.zeros(n_annot, np.int64)
            sum_s = np.zeros(n_annot)
            for j in range(p):
                nz = annot_nz[j]
                ycorr += beta[j] * mcT[j]
                temp_beta = 0.0
                for a in nz:
                    rhs = (mcTw[j] @ ycorr) * ive
                    lhs_v = np.zeros(K)
                    logl = np.empty(K)
                    for k in range(K):
                        vak = var_beta[a] * v_class[k]
                        if vak == 0.0:
                            logl[k] = log_pi[a, k]
                        else:
                            lhs_v[k] = mpm[j] * ive + 1.0 / vak
                            logl[k] = -0.5 * (np.log(vak * lhs_v[k])
                                              - rhs**2 / lhs_v[k]) + log_pi[a, k]
                    probs = np.exp(logl - logl.max())  # stabilized, invariant
                    probs /= probs.sum()
                    cls = int(np.searchsorted(np.cumsum(probs), rng.uniform()))
                    cls = min(cls, K - 1)
                    delta[j] = cls + 1
                    n_cls[a, cls] += 1
                    vak = var_beta[a] * v_class[cls]
                    if vak != 0.0:
                        n_nz[a] += 1
                        bs = rng.normal(rhs / lhs_v[cls],
                                        np.sqrt(1.0 / lhs_v[cls]))
                        sum_s[a] += bs ** 2 / v_class[cls]
                    else:
                        bs = 0.0
                    temp_beta += bs
                    ycorr -= bs * mcT[j]
                beta[j] = temp_beta
            for a in range(n_annot):
                var_beta[a] = (m_scale * m_df + sum_s[a]) / _chisq(
                    rng, m_df + n_nz[a])
            if est_pi:
                for a in range(n_annot):
                    log_pi[a] = np.log(rng.dirichlet(n_cls[a] + 1.0))

        elif method == "BayesLV":
            # functions.jl:421-486
            for j in range(p):
                ycorr += beta[j] * mcT[j]
                rhs = (mcTw[j] @ ycorr) * ive
                lhs = mpm[j] * ive + 1.0 / var_beta[j]
                beta[j] = rng.normal(rhs / lhs, np.sqrt(1.0 / lhs))
                ycorr -= beta[j] * mcT[j]
            # 3-auxiliary-variable bounded-uniform variance draw (:444-470)
            for j in range(p):
                vari = var_beta[j]
                bi = beta[j]
                zeta = snp_var_resid[j]
                var_mui = log_var[j] - zeta
                c1 = vari ** -1.5 * rng.uniform()
                c2 = np.exp(-0.5 * bi * bi / vari) * rng.uniform()
                c3 = np.exp(-0.5 * zeta * zeta / var_zeta) * rng.uniform()
                temp = np.sqrt(-2.0 * var_zeta * np.log(c3))
                lbound = np.exp(var_mui - temp)
                rbound = np.exp(var_mui + temp)
                r2 = np.exp((-2.0 / 3.0) * np.log(c1))
                if r2 < rbound:
                    rbound = r2
                with np.errstate(divide="ignore", invalid="ignore"):
                    l2 = -0.5 * bi * bi / np.log(c2) if c2 < 1.0 else 0.0
                if l2 > lbound:
                    lbound = l2
                if lbound < rbound:  # not trapped
                    vari = lbound + rng.uniform() * (rbound - lbound)
                    var_beta[j] = vari
                    log_var[j] = np.log(vari)
            # c | logVar (functions.jl:473-476)
            mean_c = icpc @ (C.T @ log_var)
            cov_c = icpc * var_zeta
            lv_c = rng.multivariate_normal(mean_c, cov_c)
            snp_var_resid = log_var - C @ lv_c
            if isinstance(est_var_zeta, float):
                var_zeta = est_var_zeta * log_var.var(ddof=1)
            elif est_var_zeta is True:
                var_zeta = snp_var_resid.var(ddof=1)

        # --- thinned accumulation (samplers.jl:26 kept rule)
        if it > burn and (it - burn) % thin == 0:
            kept += 1
            s_beta += beta
            s_var_e += var_e
            s_var_b += float(np.mean(var_beta))
            s_ebv += mc @ beta
            if method in ("BayesB", "BayesC"):
                s_pip += delta
            elif method in ("BayesR", "BayesRCpi"):
                s_pip += (v_class[delta - 1] > 0).astype(np.float64)
            else:
                s_pip += (beta != 0.0).astype(np.float64)
            if z_idx is not None:
                s_u += u
                s_var_u += var_u

    out = {
        "beta_mean": s_beta / kept,
        "pip": s_pip / kept,
        "var_e_mean": s_var_e / kept,
        "var_beta_mean": s_var_b / kept,
        "ebv_mean": s_ebv / kept,
        "kept": kept,
    }
    if z_idx is not None:
        out["u_mean"] = s_u / kept
        out["var_u_mean"] = s_var_u / kept
    return out
