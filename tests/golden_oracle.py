"""Float64 straight-line oracle of the reference's sequential Gibbs sweep.

Re-derives each sweep exactly as `runSampler!` does
(/root/reference/src/samplers.jl:29-53 and src/functions.jl), locus by locus
with naive axpy/dot updates on the dense centered marker matrix — but
consuming the *same* counter-based random streams as the JAX engine
(mirroring the key-split structure of nextgp_tpu.engine.samplers.*). Under
x64 the engine must match this oracle to float64 round-off; any divergence
is a bug in the blocked Gram algebra or in stream alignment.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nextgp_tpu.engine import rng as RNG
from nextgp_tpu.engine.plan import (
    METHOD_B,
    METHOD_C,
    METHOD_LV,
    METHOD_PR,
    METHOD_R,
    METHOD_RCPI,
    METHOD_RCPLUS,
)
from nextgp_tpu.ops import dists


def _np(x):
    return np.array(x, dtype=np.float64)  # copy: jax arrays give read-only views


def _chi2(key, df):
    return 2.0 * np.asarray(jax.random.gamma(key, np.asarray(df) / 2.0), np.float64)


class Oracle:
    """Mutable numpy mirror of ModelState, advanced one sweep at a time."""

    def __init__(self, plan, state, spec):
        self.plan = plan
        self.n = plan.n
        self.y = _np(state.y)
        self.ycorr = _np(state.ycorr)
        self.e_scale = float(state.e.scale)
        self.d_inv = None if state.e.d_inv is None else _np(state.e.d_inv)
        self.var_e = float(state.e.var_e)
        self.sweep_index = 0

        self.fixed = []
        for fs, fp in zip(state.fixed, plan.fixed):
            self.fixed.append(
                dict(x=_np(fs.x), xp=_np(fs.xp), xpx=_np(fs.xpx),
                     lhs=_np(fs.lhs_ss), rhs=_np(fs.rhs_ss), b=_np(fs.b),
                     single=fp.single)
            )
        self.random = []
        for rs, rp in zip(state.random, plan.random):
            if rp.correlated:
                self.random.append(
                    dict(corr=True, zs=_np(rs.zs), zpz=_np(rs.zpz),
                         ivstr=_np(rs.ivstr), u=_np(rs.u), var_u=_np(rs.var_u),
                         scale=_np(rs.scale), df=rp.df)
                )
            else:
                self.random.append(
                    dict(corr=False, z=_np(rs.z), zp=_np(rs.zp), zpz=_np(rs.zpz),
                         ivstr=_np(rs.ivstr), u=_np(rs.u), var_u=float(rs.var_u),
                         scale=float(rs.scale), df=rp.df)
                )
        self.markers = []
        for ms, mp, term in zip(state.markers, plan.markers, spec.markers):
            mc = term.data.centered(np.float64)  # dense centered matrix (reference storage)
            m = dict(
                mp=mp, mc=mc, p=mp.p,
                mpm=_np(ms.mpm).reshape(-1)[: mp.p],
                lhs=_np(ms.lhs_ss).reshape(-1)[: mp.p],
                rhs=_np(ms.rhs_ss).reshape(-1)[: mp.p],
                region=np.asarray(ms.region_id)[: mp.p],
                beta=_np(ms.beta)[: mp.p],
                delta=np.asarray(ms.delta)[: mp.p].copy(),
                var_beta=_np(ms.var_beta),
                scale=float(ms.scale) if np.ndim(ms.scale) == 0 else _np(ms.scale),
                df=mp.df,
            )
            for f in ("log_pi", "pi_hat", "v_class", "annot_input", "annot_prob",
                      "annot_nz", "annot_cat", "log_var", "lv_design", "lv_icpc",
                      "lv_icpc_chol", "lv_c", "lv_resid", "var_zeta"):
                v = getattr(ms, f)
                m[f] = None if v is None else _np(v) if v.dtype != jnp.bool_ else np.asarray(v)
            self.markers.append(m)

        self.corr_markers = []
        for cs, cp, term in zip(state.corr_markers, plan.corr_markers,
                                getattr(spec, "corr_markers", [])):
            mcs = [d.centered(np.float64) for d in term.datas]
            self.corr_markers.append(
                dict(cp=cp, mcs=mcs,
                     mpm=_np(cs.mpm).reshape(cp.p_pad, cp.n_t, cp.n_t)[: cp.p],
                     region=np.asarray(cs.region_id)[: cp.p],
                     beta=_np(cs.beta)[: cp.p],
                     var_beta=_np(cs.var_beta),
                     scale=_np(cs.scale))
            )

    # ---------------------------------------------------------------- sweep

    def sweep(self, chain_key):
        skey = RNG.sweep_key(chain_key, self.sweep_index)

        # varE (functions.jl:523-528)
        kv = RNG.stage_key(skey, RNG.STAGE_VAR_E)
        ss = (np.sum(self.d_inv * self.ycorr**2) if self.d_inv is not None
              else self.ycorr @ self.ycorr)
        self.var_e = float(
            (self.plan.e_df * self.e_scale + ss)
            / _chi2(kv, self.plan.e_df + self.n)
        )

        for i, f in enumerate(self.fixed):
            self._fixed(RNG.stage_key(skey, RNG.STAGE_FIXED, i), f)
        for i, r in enumerate(self.random):
            self._random(RNG.stage_key(skey, RNG.STAGE_RANDOM, i), r)
        for i, m in enumerate(self.markers):
            self._marker(RNG.stage_key(skey, RNG.STAGE_MARKER, i), m)
        for i, cm in enumerate(self.corr_markers):
            self._marker_corr(
                RNG.stage_key(skey, RNG.STAGE_MARKER, len(self.markers) + i), cm
            )
        self.sweep_index += 1

    # ---------------------------------------------------------------- stages

    def _fixed(self, key, f):
        ive = 1.0 / self.var_e
        k = len(f["b"])
        z = _np(jax.random.normal(key, (k,)))
        if f["single"]:
            x = f["x"][:, 0]
            self.ycorr += x * f["b"][0]
            rhs = f["xp"][0] @ self.ycorr * ive + f["rhs"][0]
            lhs = f["xpx"][0, 0] * ive + f["lhs"][0]
            f["b"][0] = rhs / lhs + z[0] * np.sqrt(1.0 / lhs)
            self.ycorr -= x * f["b"][0]
            return
        self.ycorr += f["x"] @ f["b"]
        yi = f["xp"] @ self.ycorr * ive
        b = f["b"].copy()
        for i in range(k):  # Wang's trick (functions.jl:27-34)
            b[i] = 0.0
            rhsb = yi[i] - f["xpx"][i] @ b * ive
            lhsb = f["xpx"][i, i] * ive
            b[i] = rhsb / lhsb + z[i] * np.sqrt(1.0 / lhsb)
        f["b"] = b
        self.ycorr -= f["x"] @ b

    def _random(self, key, r):
        kz, kv = jax.random.split(key)
        if r["corr"]:
            n_t, q = r["u"].shape
            z = _np(jax.random.normal(kz, (q, n_t)))
            self.ycorr += np.einsum("tnl,tl->n", r["zs"], r["u"])
            yi = np.einsum("tnl,n->tl", r["zs"], self.ycorr)
            ivu = np.linalg.inv(r["var_u"])
            u = r["u"].copy()
            for i in range(q):
                u[:, i] = 0.0
                rhs = yi[:, i] / self.var_e - ivu @ (u @ r["ivstr"][i])
                lhs = r["zpz"][i] / self.var_e + r["ivstr"][i, i] * ivu
                cov = np.linalg.inv(lhs)
                cov = (cov + cov.T) / 2.0
                u[:, i] = cov @ rhs + np.linalg.cholesky(cov) @ z[i]
            r["u"] = u
            s = u @ r["ivstr"] @ u.T + r["scale"]
            r["var_u"] = _np(dists.sample_inv_wishart(kv, r["df"] + q, jnp.asarray((s + s.T) / 2.0)))
            self.ycorr -= np.einsum("tnl,tl->n", r["zs"], u)
            return
        q = len(r["u"])
        z = _np(jax.random.normal(kz, (q,)))
        ive = 1.0 / self.var_e
        ivu = 1.0 / r["var_u"]
        self.ycorr += r["z"] @ r["u"]
        yi = r["zp"] @ self.ycorr * ive
        u = r["u"].copy()
        for i in range(q):  # functions.jl:63-70
            u[i] = 0.0
            rhs = yi[i] - ivu * (r["ivstr"][i] @ u)
            lhs = r["zpz"][i] * ive + r["ivstr"][i, i] * ivu
            u[i] = rhs / lhs + z[i] * np.sqrt(1.0 / lhs)
        r["u"] = u
        self.ycorr -= r["z"] @ u
        ssu = u @ r["ivstr"] @ u
        r["var_u"] = float((r["scale"] * r["df"] + ssu) / _chi2(kv, r["df"] + q))

    # ---------------------------------------------------------------- markers

    def _marker(self, key, m):
        method = m["mp"].method
        if method == METHOD_PR:
            self._marker_pr(key, m)
        elif method in (METHOD_B, METHOD_C):
            self._marker_bc(key, m, common=(method == METHOD_C))
        elif method == METHOD_R:
            self._marker_r(key, m)
        elif method == METHOD_RCPI:
            self._marker_rcpi(key, m)
        elif method == METHOD_RCPLUS:
            self._marker_rcplus(key, m)
        elif method == METHOD_LV:
            self._marker_lv(key, m)
        else:
            raise ValueError(method)

    def _dot(self, m, j):
        """Weighted rhs dot (Mp in mme.jl:299-308)."""
        col = m["mc"][:, j]
        if self.d_inv is not None:
            return (col * self.d_inv) @ self.ycorr
        return col @ self.ycorr

    def _marker_pr(self, key, m):
        mp = m["mp"]
        kz, kv = jax.random.split(key)
        z = _np(jax.random.normal(kz, (mp.p_pad,)))
        ive = 1.0 / self.var_e
        ivb = 1.0 / m["var_beta"]
        for j in range(m["p"]):  # functions.jl:124-134, region-major == index-major
            r = m["region"][j]
            self.ycorr += m["beta"][j] * m["mc"][:, j]
            rhs = self._dot(m, j) * ive + m["rhs"][j]
            lhs = m["mpm"][j] * ive + m["lhs"][j] + ivb[r]
            m["beta"][j] = rhs / lhs + z[j] * np.sqrt(1.0 / lhs)
            self.ycorr -= m["beta"][j] * m["mc"][:, j]
        sizes = np.bincount(m["region"], minlength=mp.n_var).astype(np.float64)
        ssr = np.bincount(m["region"], weights=m["beta"] ** 2, minlength=mp.n_var)
        chi = _chi2(kv, mp.df + sizes)
        m["var_beta"] = (m["scale"] * mp.df + ssr) / chi

    def _marker_bc(self, key, m, common):
        mp = m["mp"]
        kz, ku, kv, kp = jax.random.split(key, 4)
        z = _np(jax.random.normal(kz, (mp.p_pad,)))
        unif = _np(jax.random.uniform(ku, (mp.p_pad,)))
        ive = 1.0 / self.var_e
        lp0, lp1 = m["log_pi"]
        vb_common = m["var_beta"][0]
        delta = np.zeros(m["p"], np.int64)
        for j in range(m["p"]):
            vb = vb_common if common else m["var_beta"][j]
            self.ycorr += m["beta"][j] * m["mc"][:, j]
            rrr = m["mc"][:, j] @ self.ycorr  # raw dot (functions.jl:168,208)
            v0 = m["mpm"][j] * self.var_e
            v1 = m["mpm"][j] ** 2 * vb + v0
            ld0 = -0.5 * (np.log(v0) + rrr**2 / v0) + lp0
            ld1 = -0.5 * (np.log(v1) + rrr**2 / v1) + lp1
            p1 = 1.0 / (1.0 + np.exp(ld0 - ld1))
            if unif[j] < p1:
                delta[j] = 1
                rhs = self._dot(m, j) * ive + (0.0 if common else m["rhs"][j])
                with np.errstate(divide="ignore"):
                    lhs = m["mpm"][j] * ive + m["lhs"][j] + (1.0 / vb if vb > 0 else np.inf)
                m["beta"][j] = rhs / lhs + z[j] * np.sqrt(1.0 / lhs)
                self.ycorr -= m["beta"][j] * m["mc"][:, j]
            else:
                if m["beta"][j] != 0.0:
                    pass  # effect already restored; stays restored with beta=0
                m["beta"][j] = 0.0
        n_in = int(delta.sum())
        if common:
            ssb = m["beta"] @ m["beta"]
            m["var_beta"][0] = (m["scale"] * mp.df + ssb) / _chi2(kv, mp.df + n_in)
        else:
            chi = _chi2(kv, np.full(mp.p_pad, mp.df + 1.0))
            vb_new = (m["scale"] * mp.df + np.r_[m["beta"], np.zeros(mp.p_pad - m["p"])] ** 2) / chi
            m["var_beta"] = np.where(
                np.r_[delta, np.zeros(mp.p_pad - m["p"], np.int64)] == 1, vb_new, 0.0
            )
        m["delta"] = delta
        if mp.est_pi:
            pi_in = float(dists.sample_beta_dist(kp, n_in + 1.0, mp.p - n_in + 1.0))
            m["pi_hat"] = np.array([1.0 - pi_in, pi_in])
            m["log_pi"] = np.log(m["pi_hat"])

    def _marker_r(self, key, m):
        mp = m["mp"]
        kz, ku, kv, kp = jax.random.split(key, 4)
        z = _np(jax.random.normal(kz, (mp.p_pad,)))
        unif = _np(jax.random.uniform(ku, (mp.p_pad,)))
        ive = 1.0 / self.var_e
        varc = m["var_beta"][0] * m["v_class"]
        K = len(varc)
        delta = np.zeros(m["p"], np.int64)
        sum_s = 0.0
        n_nz = 0
        for j in range(m["p"]):  # functions.jl:247-277
            self.ycorr += m["beta"][j] * m["mc"][:, j]
            rhs = self._dot(m, j) * ive + m["rhs"][j]
            lhs_v = np.zeros(K)
            logl = np.zeros(K)
            for v in range(K):
                if varc[v] == 0.0:
                    logl[v] = m["log_pi"][v]
                else:
                    lhs_v[v] = m["mpm"][j] * ive + m["lhs"][j] + 1.0 / varc[v]
                    logl[v] = -0.5 * (np.log(varc[v] * lhs_v[v]) - rhs**2 / lhs_v[v]) + m["log_pi"][v]
            logl -= logl.max()
            probs = np.exp(logl)
            probs /= probs.sum()
            cls = int(np.searchsorted(np.cumsum(probs), unif[j], side="left"))
            cls = min(cls, K - 1)
            delta[j] = cls + 1
            if varc[cls] != 0.0:
                n_nz += 1
                b = rhs / lhs_v[cls] + z[j] * np.sqrt(1.0 / lhs_v[cls])
                m["beta"][j] = b
                self.ycorr -= b * m["mc"][:, j]
                sum_s += b**2 / m["v_class"][cls]
            else:
                m["beta"][j] = 0.0
        m["delta"] = delta
        m["var_beta"][0] = (m["scale"] * mp.df + sum_s) / _chi2(kv, mp.df + n_nz)
        if mp.est_pi:
            counts = np.bincount(delta - 1, minlength=K).astype(np.float64)
            m["pi_hat"] = _np(dists.sample_dirichlet(kp, jnp.asarray(counts + 1.0)))
            m["log_pi"] = np.log(m["pi_hat"])

    def _marker_rcpi(self, key, m):
        mp = m["mp"]
        kz, kua, kuv, kg1, kg2, kv, kp = jax.random.split(key, 7)
        z = _np(jax.random.normal(kz, (mp.p_pad,)))
        unif_a = _np(jax.random.uniform(kua, (mp.p_pad,)))
        unif_v = _np(jax.random.uniform(kuv, (mp.p_pad,)))
        a_in_pad = np.zeros((mp.p_pad, mp.n_annot))
        a_in_pad[: mp.p] = m["annot_input"][: mp.p]
        g1 = _np(jax.random.gamma(kg1, jnp.maximum(jnp.asarray(a_in_pad), 1e-6)))
        g2 = _np(jax.random.gamma(kg2, jnp.asarray(a_in_pad) + 1.0))
        ive = 1.0 / self.var_e
        nA, K = mp.n_annot, mp.n_classes
        varc = m["var_beta"][:, None] * m["v_class"][None, :]
        delta = np.zeros(m["p"], np.int64)
        acat = np.zeros(m["p"], np.int64)
        sum_s = np.zeros(nA)
        n_nz = np.zeros(nA, np.int64)
        counts = np.zeros((nA, K))
        for j in range(m["p"]):
            self.ycorr += m["beta"][j] * m["mc"][:, j]
            rhs = self._dot(m, j) * ive + m["rhs"][j]
            lhs_av = np.zeros((nA, K))
            logl = np.full((nA, K), -np.inf)
            for a in range(nA):
                if not m["annot_nz"][j, a]:
                    continue
                for v in range(K):
                    if varc[a, v] == 0.0:
                        logl[a, v] = m["log_pi"][a, v]
                    else:
                        lhs_av[a, v] = m["mpm"][j] * ive + m["lhs"][j] + 1.0 / varc[a, v]
                        logl[a, v] = (
                            -0.5 * (np.log(varc[a, v] * lhs_av[a, v]) - rhs**2 / lhs_av[a, v])
                            + m["log_pi"][a, v]
                        )
            mx = logl.max()
            expl = np.where(m["annot_nz"][j][:, None], np.exp(logl - mx), 0.0)
            pa = m["annot_prob"][j] * expl.sum(axis=1)
            pa = pa / pa.sum()
            a_sel = int(np.searchsorted(np.cumsum(pa), unif_a[j], side="left"))
            a_sel = min(a_sel, nA - 1)
            gam = np.where(np.arange(nA) == a_sel, g2[j], g1[j]) * m["annot_nz"][j]
            m["annot_prob"][j] = gam / gam.sum()
            pv = expl[a_sel] / expl[a_sel].sum()
            cls = int(np.searchsorted(np.cumsum(pv), unif_v[j], side="left"))
            cls = min(cls, K - 1)
            delta[j] = cls + 1
            acat[j] = a_sel + 1
            counts[a_sel, cls] += 1
            if varc[a_sel, cls] != 0.0:
                n_nz[a_sel] += 1
                b = rhs / lhs_av[a_sel, cls] + z[j] * np.sqrt(1.0 / lhs_av[a_sel, cls])
                m["beta"][j] = b
                self.ycorr -= b * m["mc"][:, j]
                sum_s[a_sel] += b**2 / m["v_class"][cls]
            else:
                m["beta"][j] = 0.0
        m["delta"] = delta
        m["annot_cat"] = acat
        chi = _chi2(kv, mp.df + n_nz.astype(np.float64))
        m["var_beta"] = (m["scale"] * mp.df + sum_s) / chi
        if mp.est_pi:
            m["pi_hat"] = _np(dists.sample_dirichlet(kp, jnp.asarray(counts + 1.0)))
            m["log_pi"] = np.log(m["pi_hat"])

    def _marker_rcplus(self, key, m):
        mp = m["mp"]
        kz, ku, kv, kp = jax.random.split(key, 4)
        nA, K = mp.n_annot, mp.n_classes
        z = _np(jax.random.normal(kz, (mp.p_pad, nA)))
        unif = _np(jax.random.uniform(ku, (mp.p_pad, nA)))
        ive = 1.0 / self.var_e
        varc = m["var_beta"][:, None] * m["v_class"][None, :]
        delta = np.zeros(m["p"], np.int64)
        sum_s = np.zeros(nA)
        n_nz = np.zeros(nA, np.int64)
        counts = np.zeros((nA, K))
        for j in range(m["p"]):
            self.ycorr += m["beta"][j] * m["mc"][:, j]
            temp_beta = 0.0
            dj = 0
            for a in range(nA):
                if not m["annot_nz"][j, a]:
                    continue
                rhs = self._dot(m, j) * ive + m["rhs"][j]
                lhs_v = np.zeros(K)
                logl = np.zeros(K)
                for v in range(K):
                    if varc[a, v] == 0.0:
                        logl[v] = m["log_pi"][a, v]
                    else:
                        lhs_v[v] = m["mpm"][j] * ive + m["lhs"][j] + 1.0 / varc[a, v]
                        logl[v] = -0.5 * (np.log(varc[a, v] * lhs_v[v]) - rhs**2 / lhs_v[v]) + m["log_pi"][a, v]
                logl -= logl.max()
                probs = np.exp(logl)
                probs /= probs.sum()
                cls = int(np.searchsorted(np.cumsum(probs), unif[j, a], side="left"))
                cls = min(cls, K - 1)
                dj = cls + 1
                counts[a, cls] += 1
                if varc[a, cls] != 0.0:
                    n_nz[a] += 1
                    bs = rhs / lhs_v[cls] + z[j, a] * np.sqrt(1.0 / lhs_v[cls])
                    sum_s[a] += bs**2 / m["v_class"][cls]
                else:
                    bs = 0.0
                temp_beta += bs
                self.ycorr -= bs * m["mc"][:, j]
            m["beta"][j] = temp_beta
            delta[j] = dj
        m["delta"] = delta
        chi = _chi2(kv, mp.df + n_nz.astype(np.float64))
        m["var_beta"] = (m["scale"] * mp.df + sum_s) / chi
        if mp.est_pi:
            m["pi_hat"] = _np(dists.sample_dirichlet(kp, jnp.asarray(counts + 1.0)))
            m["log_pi"] = np.log(m["pi_hat"])

    def _marker_corr(self, key, cm):
        """Correlated PR tuple (functions.jl:140-154)."""
        cp = cm["cp"]
        kz, kv = jax.random.split(key)
        z = _np(jax.random.normal(kz, (cp.p_pad, cp.n_t)))
        ive = 1.0 / self.var_e
        ivr = np.linalg.inv(cm["var_beta"])  # (nR, nT, nT)
        for j in range(cp.p):
            r = cm["region"][j]
            cols = np.stack([mc[:, j] for mc in cm["mcs"]], axis=1)  # (n, nT)
            self.ycorr += cols @ cm["beta"][j]
            rhs = (cols.T @ self.ycorr) * ive
            lhs = cm["mpm"][j] * ive + ivr[r]
            cov = np.linalg.inv(lhs)
            cov = (cov + cov.T) / 2.0
            mean = cov @ rhs
            cm["beta"][j] = mean + np.linalg.cholesky(cov) @ z[j]
            self.ycorr -= cols @ cm["beta"][j]
        keys = jax.random.split(kv, cp.n_regions)
        sizes = np.bincount(cm["region"], minlength=cp.n_regions).astype(float)
        for r in range(cp.n_regions):
            sel = cm["beta"][cm["region"] == r]
            sb = sel.T @ sel
            s = cm["scale"] + sb
            s = (s + s.T) / 2.0
            cm["var_beta"][r] = _np(
                dists.sample_inv_wishart(keys[r], cp.df + sizes[r], jnp.asarray(s))
            )

    def _marker_lv(self, key, m):
        mp = m["mp"]
        kz, ku, kc = jax.random.split(key, 3)
        z = _np(jax.random.normal(kz, (mp.p_pad,)))
        u4 = _np(jax.random.uniform(ku, (mp.p_pad, 4)))
        ive = 1.0 / self.var_e
        for j in range(m["p"]):  # functions.jl:431-440
            self.ycorr += m["beta"][j] * m["mc"][:, j]
            rhs = self._dot(m, j) * ive + m["rhs"][j]
            lhs = m["mpm"][j] * ive + m["lhs"][j] + 1.0 / m["var_beta"][j]
            m["beta"][j] = rhs / lhs + z[j] * np.sqrt(1.0 / lhs)
            self.ycorr -= m["beta"][j] * m["mc"][:, j]
        vz = float(m["var_zeta"])
        for j in range(m["p"]):  # functions.jl:446-470
            vari = m["var_beta"][j]
            bi = m["beta"][j]
            zeta = m["lv_resid"][j]
            var_mui = m["log_var"][j] - zeta
            c1 = vari**-1.5 * u4[j, 0]
            c2 = np.exp(-0.5 * bi * bi / vari) * u4[j, 1]
            c3 = np.exp(-0.5 * zeta * zeta / vz) * u4[j, 2]
            temp = np.sqrt(-2.0 * vz * np.log(c3))
            lb = np.exp(var_mui - temp)
            rb = np.exp(var_mui + temp)
            rb = min(rb, np.exp((-2.0 / 3.0) * np.log(c1)))
            lb = max(lb, -0.5 * bi * bi / np.log(c2))
            if lb < rb:
                vari = lb + u4[j, 3] * (rb - lb)
                m["var_beta"][j] = vari
                m["log_var"][j] = np.log(vari)
        zc = _np(jax.random.normal(kc, (mp.n_lv_cov,)))
        log_var_pad = np.zeros(mp.p_pad)
        log_var_pad[: mp.p] = m["log_var"][: mp.p]
        rhs_c = m["lv_design"].T @ log_var_pad
        mean_c = m["lv_icpc"] @ rhs_c
        m["lv_c"] = mean_c + np.sqrt(vz) * (m["lv_icpc_chol"] @ zc)
        m["lv_resid"] = log_var_pad - m["lv_design"] @ m["lv_c"]
        if isinstance(mp.est_var_zeta, bool):
            if mp.est_var_zeta:
                m["var_zeta"] = np.var(m["lv_resid"][: mp.p], ddof=1)
        else:
            m["var_zeta"] = mp.est_var_zeta * np.var(m["log_var"][: mp.p], ddof=1)
