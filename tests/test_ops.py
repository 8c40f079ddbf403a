"""ops tests: Cholesky LA vs naive formulas, MVT vs scipy, MC estimators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as osp

from snngp import ops
from snngp.nn import arch


def _rand_psd(key, n, jitter=1e-3):
    a = jax.random.normal(key, (n, n))
    return a @ a.T / n + jitter * jnp.eye(n)


def test_gp_predict_matches_naive_inverse():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (20, 4))
    xt = jax.random.normal(jax.random.PRNGKey(1), (7, 4))
    y = jax.random.normal(jax.random.PRNGKey(2), (20, 1))
    kfn = arch.get_mlp_kernel(2, 1, "relu", w_std=1.2, b_std=0.3, last_w_std=1.0)

    eps = 1e-3
    mean, cov = ops.gp_predict(kfn, x, y, xt, diag_reg=eps)

    K = np.asarray(kfn(x, x, get="nngp"), np.float64)
    Kt = np.asarray(kfn(xt, x, get="nngp"), np.float64)
    Ktt = np.asarray(kfn(xt, xt, get="nngp"), np.float64)
    # neural_tangents-relative diag_reg: eps * mean(diag K).
    A = K + eps * np.trace(K) / K.shape[0] * np.eye(K.shape[0])
    Ainv = np.linalg.inv(A)
    np.testing.assert_allclose(np.asarray(mean), Kt @ Ainv @ np.asarray(y, np.float64),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cov), Ktt - Kt @ Ainv @ Kt.T,
                               rtol=2e-3, atol=2e-4)


def test_mvn_logpdf_matches_scipy():
    key = jax.random.PRNGKey(3)
    cov = _rand_psd(key, 12)
    y = jax.random.normal(jax.random.PRNGKey(4), (12,))
    got = float(ops.mvn_logpdf(y, cov))
    expect = osp.multivariate_normal.logpdf(np.asarray(y), np.zeros(12), np.asarray(cov))
    np.testing.assert_allclose(got, expect, rtol=5e-5)  # fp32 chol vs fp64 scipy


def test_mvt_logpdf_matches_scipy():
    key = jax.random.PRNGKey(5)
    cov = _rand_psd(key, 9)
    y = jax.random.normal(jax.random.PRNGKey(6), (9,))
    df = 4.0
    got = float(ops.multivariate_t_logpdf(y, jnp.zeros(9), cov, df))
    expect = osp.multivariate_t.logpdf(np.asarray(y), np.zeros(9), np.asarray(cov), df)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_mvt_sampler_moments():
    # The (deliberately reference-faithful) iid-coordinate construction has
    # covariance factor * Cov(t) * factor^T = df/(df-2) * cov.
    key = jax.random.PRNGKey(7)
    cov = np.array([[2.0, 0.6], [0.6, 1.0]], np.float32)
    df = 8.0
    mean = jnp.array([1.0, -2.0])
    draws = ops.multivariate_t(key, df, mean, jnp.asarray(cov), shape=(200000,))
    emp_mean = np.mean(np.asarray(draws), axis=0)
    emp_cov = np.cov(np.asarray(draws).T)
    np.testing.assert_allclose(emp_mean, np.asarray(mean), atol=0.03)
    np.testing.assert_allclose(emp_cov, df / (df - 2) * cov, rtol=0.05)


def test_logdet_trace_helpers():
    key = jax.random.PRNGKey(8)
    mats = jnp.stack([_rand_psd(jax.random.PRNGKey(i), 6) for i in range(3)])
    expect_ld = sum(np.linalg.slogdet(np.asarray(m))[1] for m in mats)
    np.testing.assert_allclose(float(ops.logdet(mats)), expect_ld, rtol=1e-5)
    expect_tr = sum(np.trace(np.asarray(m)) for m in mats)
    np.testing.assert_allclose(float(ops.trace(mats)), expect_tr, rtol=1e-6)


def test_inv_psd_and_solve():
    a = _rand_psd(jax.random.PRNGKey(9), 10)
    inv = ops.inv_psd(a)
    np.testing.assert_allclose(np.asarray(a @ inv), np.eye(10), atol=1e-4)
    b = jax.random.normal(jax.random.PRNGKey(10), (10, 3))
    np.testing.assert_allclose(np.asarray(a @ ops.solve_psd(a, b)), np.asarray(b),
                               atol=1e-4)


def test_softmax_estimators_against_numpy():
    rng = np.random.RandomState(0)
    f = rng.randn(5, 7, 11).astype(np.float32)  # [C, B, S]
    labels = rng.randint(5, size=7)

    from scipy.special import logsumexp as slse
    lsm = f - slse(f, axis=0, keepdims=True)
    true_lsm = np.stack([lsm[labels[b], b, :] for b in range(7)])  # [B, S]

    got_train = float(ops.log_likelihood(jnp.asarray(f), jnp.asarray(labels)))
    np.testing.assert_allclose(got_train, true_lsm.mean(), rtol=1e-5)

    got_test = float(ops.test_log_likelihood(jnp.asarray(f), jnp.asarray(labels)))
    expect_test = np.mean(slse(true_lsm, axis=1) - np.log(11))
    np.testing.assert_allclose(got_test, expect_test, rtol=1e-5)

    agg = slse(lsm, axis=2)  # [C, B]
    expect_correct = int(np.sum(np.argmax(agg, axis=0) == labels))
    got_correct = int(ops.get_correct_count(jnp.asarray(f), jnp.asarray(labels)))
    assert got_correct == expect_correct


def test_long_name_alias_package():
    import scale_mixtures_of_neural_network_gaussian_processes_tpu as smx
    assert hasattr(smx, "nn") and hasattr(smx, "models")
    assert smx.__version__


def test_sym_t_is_bitwise_noop_on_matmul_gram():
    """sym_t flips only the layout: on a Gram whose (i, j) and (j, i)
    entries run the same reduction order (anything built from x @ x.T,
    which every kernel recursion here starts from), K.T == K bitwise, so
    cholesky(sym_t(K)) == cholesky(K) bitwise — the transpose exists purely
    to cancel XLA's gram->cholesky layout copy (see snngp.ops.linalg.sym_t).
    """
    import numpy as np
    from snngp.ops.linalg import add_jitter, sym_t

    x = jax.random.normal(jax.random.PRNGKey(5), (64, 8), dtype=jnp.float32)
    k = x @ x.T
    np.testing.assert_array_equal(np.asarray(k), np.asarray(sym_t(k)))
    a = jnp.linalg.cholesky(add_jitter(k, 1e-4))
    b = jnp.linalg.cholesky(add_jitter(sym_t(k), 1e-4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
