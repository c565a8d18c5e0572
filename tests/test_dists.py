"""Moment checks for the scalar conditional-draw kernels (SURVEY.md §4.1)."""
import jax
import jax.numpy as jnp
import numpy as np

from nextgp_tpu.ops import dists


def test_scaled_inv_chi2_moments():
    key = jax.random.key(0)
    df, scale, ss, n = 4.0, 2.0, 30.0, 20.0
    keys = jax.random.split(key, 20000)
    draws = jax.vmap(lambda k: dists.sample_scaled_inv_chi2(k, df, scale, ss, n))(keys)
    # X = (df*scale + ss)/chi2(df+n); E[1/chi2(k)] = 1/(k-2)
    expect = (df * scale + ss) / (df + n - 2.0)
    assert abs(float(draws.mean()) - expect) / expect < 0.02


def test_beta_moments():
    keys = jax.random.split(jax.random.key(1), 20000)
    draws = jax.vmap(lambda k: dists.sample_beta_dist(k, 3.0, 7.0))(keys)
    assert abs(float(draws.mean()) - 0.3) < 0.01
    var = 3.0 * 7.0 / (10.0**2 * 11.0)
    assert abs(float(draws.var()) - var) / var < 0.05


def test_dirichlet_moments():
    alpha = jnp.array([1.0, 2.0, 3.0])
    keys = jax.random.split(jax.random.key(2), 20000)
    draws = jax.vmap(lambda k: dists.sample_dirichlet(k, alpha))(keys)
    np.testing.assert_allclose(np.asarray(draws.mean(0)), [1 / 6, 2 / 6, 3 / 6], atol=0.01)


def test_inv_wishart_mean():
    s = jnp.array([[2.0, 0.3], [0.3, 1.0]])
    df = 8.0
    keys = jax.random.split(jax.random.key(3), 4000)
    draws = jax.vmap(lambda k: dists.sample_inv_wishart(k, df, s))(keys)
    # E[IW(df, S)] = S / (df - p - 1)
    np.testing.assert_allclose(
        np.asarray(draws.mean(0)), np.asarray(s) / (df - 3.0), rtol=0.08, atol=0.02
    )


def test_categorical_from_probs_matches_reference_rule():
    # findfirst(cum .>= u) semantics (functions.jl:261)
    probs = jnp.array([0.2, 0.5, 0.3])
    u = jnp.array([0.0, 0.19, 0.2, 0.21, 0.69, 0.71, 1.0])
    idx = dists.categorical_from_probs(u, jnp.broadcast_to(probs, (7, 3)))
    np.testing.assert_array_equal(np.asarray(idx), [0, 0, 0, 1, 1, 2, 2])


def test_chi2_traced_df():
    # data-dependent dof must work under jit (BayesC, functions.jl:230)
    @jax.jit
    def f(key, n_in):
        return dists.sample_chi2(key, 4.0 + n_in)

    keys = jax.random.split(jax.random.key(4), 8000)
    draws = jax.vmap(lambda k: f(k, jnp.asarray(16.0)))(keys)
    assert abs(float(draws.mean()) - 20.0) < 0.3
