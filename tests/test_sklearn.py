"""sklearn-facade estimators: fit/predict round-trips, ML-II training
improves the marginal likelihood, and parity with the underlying model
layer (snngp/sklearn.py)."""

import numpy as np
import jax.numpy as jnp

from snngp.sklearn import SNNGPClassifier, SNNGPRegressor


def _toy_regression(n=80, d=4, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    y = np.sin(x[:, 0]) + 0.1 * rng.randn(n).astype(np.float32) + 3.0
    return x, y


def test_regressor_fit_predict_score():
    x, y = _toy_regression()
    est = SNNGPRegressor(method="gp", num_hiddens=2, eps=1e-2)
    assert est.fit(x, y) is est
    mean, std = est.predict(x, return_std=True)
    assert mean.shape == (80,) and std.shape == (80,)
    assert np.all(std >= 0)
    # In-sample R^2 of an exact GP with small jitter should be high.
    assert est.score(x, y) > 0.8
    assert np.isfinite(est.neg_log_likelihood(x, y))


def test_regressor_tp_matches_model_layer():
    """Estimator predictive NLL equals FittedSPR/SPR on the same data."""
    x, y = _toy_regression(seed=1)
    est = SNNGPRegressor(method="tp", num_hiddens=2, alpha=2.0, beta=2.0,
                         eps=1e-2)
    est.fit(x, y)
    s = est.fitted_.state
    y_n = (jnp.asarray(y) - s["y_mean"]) / s["y_std"]
    want = float(est.model_.test_nll(est.params_, jnp.asarray(x), y_n))
    got = est.neg_log_likelihood(x, y)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_regressor_mlii_training_reduces_loss():
    x, y = _toy_regression(seed=2)
    base = SNNGPRegressor(method="gp", num_hiddens=2, eps=1e-2, max_steps=0)
    base.fit(x, y)
    loss0 = float(base.model_.loss(base.params_))
    trained = SNNGPRegressor(method="gp", num_hiddens=2, eps=1e-2,
                             max_steps=25, lr=1e-2)
    trained.fit(x, y)
    assert trained.final_loss_ < loss0


def test_regressor_sklearn_protocol():
    est = SNNGPRegressor(method="gp", num_hiddens=3)
    params = est.get_params()
    assert params["num_hiddens"] == 3
    est.set_params(num_hiddens=5, method="tp")
    assert est.num_hiddens == 5 and est.method == "tp"
    clone = SNNGPRegressor(**est.get_params())
    assert clone.get_params() == est.get_params()


def test_classifier_fit_predict_mlp():
    rng = np.random.RandomState(0)
    n = 60
    x = rng.randn(n, 6).astype(np.float32)
    y = (x[:, 0] + 0.3 * rng.randn(n) > 0).astype(int) + 7  # labels {7, 8}
    est = SNNGPClassifier(method="svtp", network="mlp", num_hiddens=2,
                          num_inducing=16, num_samples=20, batch_size=30,
                          epochs=3, eps=1e-2)
    est.fit(x, y)
    assert list(est.classes_) == [7, 8]
    proba = est.predict_proba(x, num_samples=200)
    assert proba.shape == (n, 2)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-3)
    pred = est.predict(x)
    assert set(pred).issubset({7, 8})
    assert est.score(x, y) > 0.6  # separable-ish toy task


def test_classifier_fit_predict_myrtle():
    """network='myrtle' (images): inducing inputs must stay frozen at their
    class-proportional init while the ELBO still trains."""
    rng = np.random.RandomState(1)
    n = 48
    x = rng.rand(n, 8, 8, 1).astype(np.float32)
    y = (x.mean(axis=(1, 2, 3)) > 0.5).astype(int)
    est = SNNGPClassifier(method="svgp", network="myrtle", num_hiddens=5,
                          num_inducing=8, num_samples=8, batch_size=24,
                          epochs=1, eps=1e-2)
    est.fit(x, y)
    proba = est.predict_proba(x, num_samples=50)
    assert proba.shape == (n, 2)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-3)
    # Frozen inducing inputs: present in params_, zero optimizer movement.
    iv = [v for name, v in est.params_.items() if "inducing_variable" in name]
    assert iv and np.all(np.isfinite(np.asarray(iv[0])))
    z0 = np.asarray(est.model_.init_params()["inducing_variable"])
    np.testing.assert_array_equal(np.asarray(iv[0]), z0)
