"""Random-effect Gibbs stages (sampleZ!/sampleU, functions.jl:57-110) and
their variance draws (sampleVarU/sampleCoVarU, functions.jl:498-506).

The per-level loop is a Gauss–Seidel scan against the dense inverse
structure (A^-1 / G^-1 / I); the structure row i is the scanned input so the
whole update is one `lax.scan` over levels — sequential like the reference,
but with the rhs dot on the VPU instead of BLAS-1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ...ops.dists import sample_inv_wishart, sample_scaled_inv_chi2


def sample_random_uni(key, rs, ycorr, var_e, df):
    """Univariate random effect. Returns (u, var_u, ycorr)."""
    q = rs.u.shape[0]
    kz, kv = jax.random.split(key)
    z = jax.random.normal(kz, (q,), rs.u.dtype)
    ive = 1.0 / var_e
    ivu = 1.0 / rs.var_u

    ycorr = ycorr + rs.z @ rs.u
    yi = (rs.zp @ ycorr) * ive  # functions.jl:61

    def body(u, xs):
        i, arow, zi = xs
        u = u.at[i].set(0.0)
        rhs = yi[i] - ivu * jnp.dot(arow, u)  # functions.jl:65
        lhs = rs.zpz[i] * ive + arow[i] * ivu  # functions.jl:66
        ui = rhs / lhs + zi * jnp.sqrt(1.0 / lhs)
        return u.at[i].set(ui), None

    u, _ = lax.scan(body, rs.u, (jnp.arange(q), rs.ivstr, z))
    ycorr = ycorr - rs.z @ u

    ss = u @ rs.ivstr @ u
    var_u = sample_scaled_inv_chi2(kv, df, rs.scale, ss, float(q))  # functions.jl:498-501
    return u, var_u, ycorr


def sample_random_corr(key, rs, ycorr, var_e, df):
    """Correlated group (tuple key): per-level MvNormal with Kronecker
    structure (functions.jl:75-110). Returns (u, var_u, ycorr)."""
    n_t, q = rs.u.shape
    kz, kv = jax.random.split(key)
    z = jax.random.normal(kz, (q, n_t), rs.u.dtype)

    # restore all components (functions.jl:101-104)
    ycorr = ycorr + jnp.einsum("tnl,tl->n", rs.zs, rs.u)
    yi = jnp.einsum("tnl,n->tl", rs.zs, ycorr)  # per-level Z_l' ycorr
    ivu = jnp.linalg.inv(rs.var_u)

    def body(u, xs):
        i, arow, zpz_i, zi = xs
        u = u.at[:, i].set(0.0)
        # kron(ivstr[i,:], iVarU) @ vec(u) == iVarU @ (u @ ivstr[i,:]) (functions.jl:82)
        rhs = yi[:, i] / var_e - ivu @ (u @ arow)
        lhs = zpz_i / var_e + arow[i] * ivu  # functions.jl:83
        cov = jnp.linalg.inv(lhs)
        cov = (cov + cov.T) / 2.0
        mean = cov @ rhs
        ui = mean + jnp.linalg.cholesky(cov) @ zi
        return u.at[:, i].set(ui), None

    u, _ = lax.scan(body, rs.u, (jnp.arange(q), rs.ivstr, rs.zpz, z))

    # covariance draw BEFORE removing effects, as in functions.jl:105-106
    s = u @ rs.ivstr @ u.T + rs.scale
    var_u = sample_inv_wishart(kv, df + q, (s + s.T) / 2.0)

    ycorr = ycorr - jnp.einsum("tnl,tl->n", rs.zs, u)
    return u, var_u, ycorr
