"""Residual-variance draw (sampleVarE, functions.jl:523-528)."""
from __future__ import annotations

import jax.numpy as jnp

from ...ops.dists import sample_scaled_inv_chi2


def sample_var_e(key, e_state, ycorr, n, e_df):
    """varE ~ (df*scale + e'We)/chi2(df + n); W = I or diag(1/w)
    (functions.jl:523-525 unweighted, :526-528 weighted)."""
    if e_state.d_inv is not None:
        ss = jnp.sum(e_state.d_inv * ycorr * ycorr)
    else:
        ss = jnp.dot(ycorr, ycorr)
    return sample_scaled_inv_chi2(key, e_df, e_state.scale, ss, float(n))
