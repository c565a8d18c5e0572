"""Independent plain-NumPy oracle for COMPOSITE MME models.

Extends the single-marker-set oracle (oracle_np.py) to the reference's
composite surface, written directly against the Julia source with its own
RNG and no engine imports:

  * pedigree A^-1 random effects — the uni sampleU per-level scan
    (/root/reference/src/functions.jl:57-72) with iVarStr = A^-1; A is
    built here by the TABULAR method and inverted numerically
    (np.linalg.inv), deliberately NOT Henderson's rules, so the engine's
    sparse Henderson construction is cross-checked by an independent path.
  * correlated random-effect tuples — sampleU(zSet::Tuple)
    (functions.jl:75-88): per-level MvNormal with kron(iVarStr[i,:], iVarU),
    sampleCoVarU InverseWishart (functions.jl:503-506).
  * blocked fixed effects — Wang's trick sampleb! (functions.jl:22-36;
    note it applies NO summary-stat offsets, unlike single-column
    sampleX!, functions.jl:41-47).
  * multiple BayesPR marker sets with per-region variances and
    SummaryStatistics lhs/rhs offsets with the Inf/NaN guards
    (mme.jl:286-322; sampler functions.jl:118-137).
  * windowed / per-chromosome regions — prep2RegionData semantics
    (misc.jl:163-215) reimplemented from the source.
  * correlated marker sets — sampleBayesPR!(mSet::Tuple)
    (functions.jl:140-154) with per-region InverseWishart
    (sampleVarCovBetaPR, functions.jl:513-516).

Hyperparameters follow mme.jl: residual df 4, scale v*(df-2)/df
(mme.jl:87-94); Z df = 3+dim(v), matrix scale v*(df-p-1), scalar
v*(df-2)/df (mme.jl:264-272); M likewise with default df 4
(mme.jl:492-506); xpx ridge jitter min(|diag|)/1e4 only on multi-column
blocks (mme.jl:146-152).
"""
from __future__ import annotations

import numpy as np


# ------------------------------------------------------------------ pedigree


def tabular_a(sire, dam):
    """Dense relationship matrix by the tabular method (parents listed
    before offspring; -1 = unknown). Independent of Henderson's rules."""
    sire = np.asarray(sire, np.int64)
    dam = np.asarray(dam, np.int64)
    q = sire.size
    A = np.zeros((q, q))
    for i in range(q):
        s, d = sire[i], dam[i]
        for j in range(i):
            aj = 0.0
            if s >= 0:
                aj += 0.5 * A[j, s]
            if d >= 0:
                aj += 0.5 * A[j, d]
            A[i, j] = A[j, i] = aj
        A[i, i] = 1.0 + (0.5 * A[s, d] if (s >= 0 and d >= 0) else 0.0)
    return A


def tabular_a_inverse(sire, dam):
    return np.linalg.inv(tabular_a(sire, dam))


# ------------------------------------------------------------------ regions


def region_ranges(p, r, chr_ids=None):
    """prep2RegionData semantics (misc.jl:163-215) as (lo, hi) index pairs.

    r == 9999 -> one region; r == 99 -> one region per chromosome (map
    sorted by chr, ids 1..C as the reference's accRegionVec indexing
    assumes); else fixed windows of r SNPs per chromosome (last window of
    each chromosome short)."""
    if chr_ids is None or r == 9999:
        return [(0, p)]
    chr_ids = np.asarray(chr_ids)
    out = []
    pos = 0
    for c in np.unique(chr_ids):
        tot = int((chr_ids == c).sum())
        if r == 99:
            out.append((pos, pos + tot))
        else:
            for lo in range(0, tot, r):
                out.append((pos + lo, pos + min(lo + r, tot)))
        pos += tot
    return out


# ------------------------------------------------------------------ draws


def _chisq(rng, df):
    return rng.chisquare(df)


def _chol2(S):
    """Cholesky of a small SPD matrix (own implementation, not a replay of
    the engine's jnp.linalg path)."""
    return np.linalg.cholesky((S + S.T) / 2.0)


def _mvn(rng, mean, cov):
    return mean + _chol2(cov) @ rng.standard_normal(mean.shape[0])


def _inv_wishart(rng, df, S):
    """InverseWishart(df, S) via Bartlett on Wishart(df, inv(S)).

    The scale factor M = inv(chol(S))' satisfies M M' = inv(S) (any square
    root works for the Wishart scale transform), and is computed by a
    triangular solve — chol(np.linalg.inv(S)) loses positive-definiteness
    when S is large/ill-conditioned."""
    p = S.shape[0]
    Ls = _chol2(S)
    M = np.linalg.solve(Ls, np.eye(p)).T  # M M' = inv(S)
    A = np.zeros((p, p))
    for i in range(p):
        A[i, i] = np.sqrt(rng.chisquare(df - i))
        for j in range(i):
            A[i, j] = rng.standard_normal()
    W = M @ A @ A.T @ M.T
    return np.linalg.inv(W)


# ------------------------------------------------------------------ chain


def run_mme_oracle(y, chain=4000, burn=1000, thin=5, seed=1, v_e=1.0,
                   fixed=None, z_terms=None, corr_z=None,
                   markers=None, corr_m=None):
    """Composite sequential Gibbs chain. All marker sets are BayesPR.

    fixed: list of blocks; each {"x": (n,k), optional "ss": (m, v) arrays
      applied ONLY when k == 1 (the reference's blocked sampleb! ignores
      them)}. A block with k>1 runs Wang's trick with the jittered xpx.
    z_terms: list of {"z": (n,q) incidence, "ivstr": (q,q) or None -> I,
      "v": prior variance}.
    corr_z: {"zs": [(n,q)] * nT, "ivstr": (q,q) or None, "v": (nT,nT)}.
    markers: list of {"g": (n,p) dosages, "v": variance, "r": region
      sentinel/window size (default 9999), "chr_ids": map or None,
      "ss": (m, v) per-locus arrays or None}.
    corr_m: {"gs": [(n,p)] * nT, "v": (nT,nT), "r": ..., "chr_ids": ...}.

    Returns posterior means: b, per-set beta/ebv, per-term u/var_u,
    corr u, corr-set beta/ebv, var_e.
    """
    rng = np.random.default_rng(seed)
    y = np.asarray(y, np.float64)
    n = y.size
    fixed = fixed or []
    z_terms = z_terms or []
    markers = markers or []

    e_df = 4.0
    e_scale = v_e * (e_df - 2.0) / e_df

    # ---- fixed blocks (mme.jl:98-153)
    fx = []
    for blk in fixed:
        x = np.asarray(blk["x"], np.float64)
        if x.ndim == 1:
            x = x[:, None]
        k = x.shape[1]
        xpx = x.T @ x
        if k > 1:  # jitter only Matrix xpx (mme.jl:146-152)
            xpx = xpx + np.eye(k) * np.abs(np.diag(xpx)).min() / 10000.0
        lhs_ss = np.zeros(k)
        rhs_ss = np.zeros(k)
        if k == 1 and blk.get("ss") is not None:
            m_, v_ = blk["ss"]
            lhs_ss[:] = 1.0 / np.asarray(v_, np.float64)
            rhs_ss[:] = lhs_ss * np.asarray(m_, np.float64)
        fx.append(dict(x=x, k=k, xpx=xpx, lhs_ss=lhs_ss, rhs_ss=rhs_ss,
                       b=np.zeros(k)))

    # ---- uni random effects (mme.jl:170-204, functions.jl:57-72).
    # optional per-level SummaryStatistics offsets (mme.jl:201-204): the
    # reference folds lhs = 1/v, rhs = m/v into the per-level conditional
    # — NOTE its uni sampleU (functions.jl:57-72) does NOT add them (only
    # sampleX!/sampleBayesPR! consume :lhs/:rhs), so Z-attached summary
    # stats are stored but IGNORED by the executed sampler; mirror that.
    zs = []
    for t in z_terms:
        z = np.asarray(t["z"], np.float64)
        q = z.shape[1]
        iv = np.asarray(t["ivstr"], np.float64) if t.get("ivstr") is not None \
            else np.eye(q)
        v = float(t["v"])
        df = 4.0  # 3 + dim(v) scalar
        zs.append(dict(z=z, q=q, iv=iv, zpz=np.einsum("nq,nq->q", z, z),
                       df=df, scale=v * (df - 2.0) / df,
                       u=np.zeros(q), var_u=v))

    # ---- correlated random tuple (mme.jl:207-239, functions.jl:75-110)
    cz = None
    if corr_z is not None:
        zmats = [np.asarray(z, np.float64) for z in corr_z["zs"]]
        n_t = len(zmats)
        q = zmats[0].shape[1]
        iv = np.asarray(corr_z["ivstr"], np.float64) \
            if corr_z.get("ivstr") is not None else np.eye(q)
        vmat = np.asarray(corr_z["v"], np.float64)
        df = 3.0 + n_t
        # zpz[l] = Z_l' Z_l over the stacked per-level columns (MatByMat)
        zstack = np.stack(zmats)  # (nT, n, q)
        zpz = np.einsum("tnl,unl->ltu", zstack, zstack)  # (q, nT, nT)
        cz = dict(zmats=zmats, n_t=n_t, q=q, iv=iv, zpz=zpz, df=df,
                  scale=vmat * (df - n_t - 1.0),
                  u=np.zeros((n_t, q)), var_u=vmat.copy())

    # ---- marker sets (BayesPR, mme.jl:286-349; functions.jl:118-137)
    ms = []
    for t in markers:
        g = np.asarray(t["g"], np.float64)
        p = g.shape[1]
        mc = g - g.mean(axis=0)
        mcT = np.ascontiguousarray(mc.T)
        v = float(t["v"])
        df = 4.0
        regions = region_ranges(p, int(t.get("r", 9999)), t.get("chr_ids"))
        lhs_ss = np.zeros(p)
        rhs_ss = np.zeros(p)
        if t.get("ss") is not None:  # mme.jl:313-322 incl. Inf/NaN guards
            m_, v_ = (np.asarray(a, np.float64) for a in t["ss"])
            with np.errstate(divide="ignore", invalid="ignore"):
                lhs_ss = 1.0 / v_
                rhs_ss = lhs_ss * m_
            lhs_ss[np.isinf(lhs_ss)] = 0.0
            rhs_ss[np.isnan(rhs_ss)] = 0.0
        ms.append(dict(mc=mc, mcT=mcT, p=p,
                       mpm=np.einsum("ij,ij->i", mcT, mcT),
                       regions=regions, df=df,
                       scale=v * (df - 2.0) / df,
                       lhs_ss=lhs_ss, rhs_ss=rhs_ss,
                       beta=np.zeros(p),
                       var_beta=np.full(len(regions), v)))

    # ---- correlated marker sets (mme.jl:448-489; functions.jl:140-154)
    cm = None
    if corr_m is not None:
        gs = [np.asarray(g, np.float64) for g in corr_m["gs"]]
        n_t = len(gs)
        p = gs[0].shape[1]
        mcs = np.stack([g - g.mean(axis=0) for g in gs])  # (nT, n, p)
        dat = np.transpose(mcs, (2, 1, 0))  # (p, n, nT) per-locus stacks
        mpm = np.einsum("jnt,jnu->jtu", dat, dat)  # (p, nT, nT)
        vmat = np.asarray(corr_m["v"], np.float64)
        df = 3.0 + n_t
        regions = region_ranges(p, int(corr_m.get("r", 9999)),
                                corr_m.get("chr_ids"))
        cm = dict(dat=dat, mpm=mpm, p=p, n_t=n_t, regions=regions, df=df,
                  scale=vmat * (df - n_t - 1.0),
                  beta=np.zeros((p, n_t)),
                  var_beta=np.stack([vmat.copy() for _ in regions]))

    ycorr = y.copy()
    var_e = v_e

    kept = 0
    acc = dict(
        b=[np.zeros(f["k"]) for f in fx],
        beta=[np.zeros(m["p"]) for m in ms],
        u=[np.zeros(z["q"]) for z in zs],
        var_u=[0.0 for _ in zs],
        var_e=0.0,
        var_beta=[np.zeros(len(m["regions"])) for m in ms],
    )
    if cz is not None:
        acc["cz_u"] = np.zeros((cz["n_t"], cz["q"]))
        acc["cz_var_u"] = np.zeros((cz["n_t"], cz["n_t"]))
    if cm is not None:
        acc["cm_beta"] = np.zeros((cm["p"], cm["n_t"]))
        acc["cm_var"] = np.zeros((len(cm["regions"]), cm["n_t"], cm["n_t"]))

    for it in range(1, chain + 1):
        # --- varE (functions.jl:523-524)
        var_e = (e_df * e_scale + ycorr @ ycorr) / _chisq(rng, e_df + n)
        ive = 1.0 / var_e

        # --- fixed blocks (functions.jl:39-53)
        for f in fx:
            x, b = f["x"], f["b"]
            if f["k"] == 1:
                ycorr += x[:, 0] * b[0]
                rhs = (x[:, 0] @ ycorr) * ive + f["rhs_ss"][0]
                lhs = f["xpx"][0, 0] * ive + f["lhs_ss"][0]
                b[0] = rng.normal(rhs / lhs, np.sqrt(1.0 / lhs))
                ycorr -= x[:, 0] * b[0]
            else:  # Wang's trick (functions.jl:22-36), NO ss offsets
                ycorr += x @ b
                yi = (x.T @ ycorr) * ive
                for i in range(f["k"]):
                    b[i] = 0.0
                    rhsb = yi[i] - (f["xpx"][i] @ b) * ive
                    lhsb = f["xpx"][i, i] * ive
                    b[i] = rng.normal(rhsb / lhsb, np.sqrt(1.0 / lhsb))
                ycorr -= x @ b

        # --- uni random effects (functions.jl:57-72 + sampleVarU :498-501)
        for zt in zs:
            z, u, iv = zt["z"], zt["u"], zt["iv"]
            ycorr += z @ u
            yi = (z.T @ ycorr) * ive  # computed once for ALL rhsU
            ivu = 1.0 / zt["var_u"]
            for i in range(zt["q"]):
                u[i] = 0.0
                rhs_u = yi[i] - ivu * (iv[:, i] @ u)
                lhs_u = zt["zpz"][i] * ive + iv[i, i] * ivu
                u[i] = rng.normal(rhs_u / lhs_u, np.sqrt(1.0 / lhs_u))
            ycorr -= z @ u
            zt["var_u"] = (zt["scale"] * zt["df"] + u @ iv @ u) / _chisq(
                rng, zt["df"] + zt["q"])

        # --- correlated random tuple (functions.jl:75-110)
        if cz is not None:
            u = cz["u"]  # (nT, q)
            for c_, zm in enumerate(cz["zmats"]):
                ycorr += zm @ u[c_]
            iv_u = np.linalg.inv(cz["var_u"])
            iv = cz["iv"]
            for i in range(cz["q"]):
                u[:, i] = 0.0
                yi = np.array([zm[:, i] @ ycorr for zm in cz["zmats"]])
                # kron(iVarStr[i,:], iVarU) @ vec(u) = iVarU @ (u @ iv[i,:])
                rhs_u = yi * ive - iv_u @ (u @ iv[i])
                inv_lhs = np.linalg.inv(cz["zpz"][i] * ive + iv[i, i] * iv_u)
                u[:, i] = _mvn(rng, inv_lhs @ rhs_u, inv_lhs)
            # sampleCoVarU BEFORE the re-subtract (sampleZ! tuple order,
            # functions.jl:104-109)
            cz["var_u"] = _inv_wishart(
                rng, cz["df"] + cz["q"], u @ iv @ u.T + cz["scale"])
            for c_, zm in enumerate(cz["zmats"]):
                ycorr -= zm @ u[c_]

        # --- marker sets (functions.jl:118-137)
        for m in ms:
            mcT, beta = m["mcT"], m["beta"]
            for r_, (lo, hi) in enumerate(m["regions"]):
                ivb = 1.0 / m["var_beta"][r_]
                for j in range(lo, hi):
                    ycorr += beta[j] * mcT[j]
                    rhs = (mcT[j] @ ycorr) * ive + m["rhs_ss"][j]
                    lhs = m["mpm"][j] * ive + m["lhs_ss"][j] + ivb
                    beta[j] = rng.normal(rhs / lhs, np.sqrt(1.0 / lhs))
                    ycorr -= beta[j] * mcT[j]
                bs = beta[lo:hi]
                m["var_beta"][r_] = (m["scale"] * m["df"] + bs @ bs) / _chisq(
                    rng, m["df"] + (hi - lo))

        # --- correlated marker sets (functions.jl:140-154)
        if cm is not None:
            dat, beta = cm["dat"], cm["beta"]
            for r_, (lo, hi) in enumerate(cm["regions"]):
                inv_b = np.linalg.inv(cm["var_beta"][r_])
                for j in range(lo, hi):
                    ycorr += dat[j] @ beta[j]
                    rhs = (dat[j].T @ ycorr) * ive
                    inv_lhs = np.linalg.inv(cm["mpm"][j] * ive + inv_b)
                    beta[j] = _mvn(rng, inv_lhs @ rhs, inv_lhs)
                    ycorr -= dat[j] @ beta[j]
                B = beta[lo:hi]
                cm["var_beta"][r_] = _inv_wishart(
                    rng, cm["df"] + (hi - lo), cm["scale"] + B.T @ B)

        # --- thinned accumulation (samplers.jl:26)
        if it > burn and (it - burn) % thin == 0:
            kept += 1
            for f, a in zip(fx, acc["b"]):
                a += f["b"]
            for m, a in zip(ms, acc["beta"]):
                a += m["beta"]
            for m, a in zip(ms, acc["var_beta"]):
                a += m["var_beta"]
            for i, zt in enumerate(zs):
                acc["u"][i] += zt["u"]
                acc["var_u"][i] += zt["var_u"]
            acc["var_e"] += var_e
            if cz is not None:
                acc["cz_u"] += cz["u"]
                acc["cz_var_u"] += cz["var_u"]
            if cm is not None:
                acc["cm_beta"] += cm["beta"]
                acc["cm_var"] += cm["var_beta"]

    out = {
        "b": [a / kept for a in acc["b"]],
        "beta_mean": [a / kept for a in acc["beta"]],
        "var_beta_mean": [a / kept for a in acc["var_beta"]],
        "u_mean": [a / kept for a in acc["u"]],
        "var_u_mean": [a / kept for a in acc["var_u"]],
        "var_e_mean": acc["var_e"] / kept,
        "ebv_mean": sum(
            (m["mc"] @ (a / kept) for m, a in zip(ms, acc["beta"])),
            np.zeros(n)),
        "kept": kept,
    }
    if cz is not None:
        out["cz_u_mean"] = acc["cz_u"] / kept
        out["cz_var_u_mean"] = acc["cz_var_u"] / kept
    if cm is not None:
        out["cm_beta_mean"] = acc["cm_beta"] / kept
        out["cm_var_mean"] = acc["cm_var"] / kept
        out["ebv_mean"] = out["ebv_mean"] + np.einsum(
            "jnt,jt->n", cm["dat"], out["cm_beta_mean"])
    return out
