"""Scalar conditional-draw kernels used by every Gibbs stage.

Each function mirrors the exact parameterization of a draw in the reference
(`/root/reference/src/functions.jl:493-544` and hyper-parameter conventions
of `src/mme.jl:87-94,264-272,492-506`), re-expressed as pure JAX on
counter-based keys so draws are reproducible and shard-invariant.

All draws are vectorizable: shape parameters may be traced values
(``jax.random.gamma`` supports traced concentrations), so data-dependent
degrees of freedom (e.g. chi2(df + nIncluded) in BayesC,
functions.jl:230) compile under jit without dynamic shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_chi2(key, df):
    """chi2(df) draw; df may be traced. chi2(k) == 2 * Gamma(k/2, scale=2)/2."""
    return 2.0 * jax.random.gamma(key, jnp.asarray(df) / 2.0)


def sample_scaled_inv_chi2(key, df, scale, ss, n):
    """(df*scale + ss) / chi2(df + n).

    The scaled-inverse-chi-square conditional used for every scalar variance
    in the reference:
      - residual variance  (functions.jl:523-525)
      - random-effect variance (functions.jl:498-501)
      - region marker variance BayesPR (functions.jl:509-511)
      - BayesR class variance (functions.jl:518-520)
    """
    return (df * scale + ss) / sample_chi2(key, df + n)


def sample_normal(key, mean, sd):
    return mean + sd * jax.random.normal(key, jnp.shape(mean))


def sample_beta_dist(key, a, b):
    """Beta(a, b) via two gammas; a, b may be traced (samplePi, functions.jl:531-533)."""
    k1, k2 = jax.random.split(key)
    g1 = jax.random.gamma(k1, a)
    g2 = jax.random.gamma(k2, b)
    return g1 / (g1 + g2)


def sample_dirichlet(key, alpha):
    """Dirichlet(alpha) via normalized gammas; alpha may be traced
    (samplePi vector form, functions.jl:536-538; sampleProb, functions.jl:541-544)."""
    g = jax.random.gamma(key, alpha)
    return g / jnp.sum(g, axis=-1, keepdims=True)


def sample_wishart(key, df, scale_chol, p):
    """Wishart(df, V) draw via the Bartlett decomposition.

    ``scale_chol`` is chol(V) (lower). p is the static dimension. df may be
    traced but must satisfy df > p - 1.
    """
    kn, kc = jax.random.split(key)
    tril = jnp.tril(jax.random.normal(kn, (p, p)), k=-1)
    dfs = jnp.asarray(df) - jnp.arange(p)
    diag = jnp.sqrt(2.0 * jax.random.gamma(kc, dfs / 2.0))
    a = tril + jnp.diag(diag)
    la = scale_chol @ a
    return la @ la.T


def sample_inv_wishart(key, df, S):
    """InverseWishart(df, S) matching Distributions.jl's parameterization
    (mean = S/(df-p-1)), used for correlated random-effect covariances
    (sampleCoVarU, functions.jl:503-506) and correlated marker-set region
    covariances (sampleVarCovBetaPR, functions.jl:513-516).

    If X ~ InvWishart(df, S) then X^-1 ~ Wishart(df, S^-1).
    """
    p = S.shape[-1]
    S_inv = jnp.linalg.inv(S)
    chol = jnp.linalg.cholesky(S_inv)
    w = sample_wishart(key, df, chol, p)
    return jnp.linalg.inv(w)


def categorical_from_probs(u, probs):
    """Inverse-CDF categorical draw from a single uniform, replicating the
    reference's `findfirst(x->x>=rand(), cumsum(probs))` (functions.jl:259-261).

    ``u`` broadcasts against leading axes of ``probs``; returns int32 index
    along the last axis.
    """
    cum = jnp.cumsum(probs, axis=-1)
    cls = jnp.sum((cum < u[..., None]).astype(jnp.int32), axis=-1)
    # f32 cumsum can round the final CDF entry just below 1.0; a uniform in
    # that sliver would index one past the last class (invalid delta, and a
    # kernel/pure-path divergence) — clamp like the kernels do
    return jnp.minimum(cls, probs.shape[-1] - 1)
