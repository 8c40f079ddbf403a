"""Model-layer tests: bijectors, priors/KL formulas vs dense references,
likelihood formulas, SPR/SVSP losses against hand-computed dense math."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as osp

from snngp.models import (
    SPR, SVSP, NNGPKernel, GaussianLikelihood, StudentTLikelihood,
    GaussianPrior, InverseGammaPrior, positive,
)
from snngp.models.bijectors import Softplus, Exp
from snngp.models import params as P
from snngp.nn import arch
from snngp import ops


# ---------------------------------------------------------------------------
# bijectors
# ---------------------------------------------------------------------------

def test_softplus_roundtrip_and_large_x_guard():
    bij = Softplus()
    for v in [1e-4, 0.5, 3.0, 25.0, 100.0]:
        raw = bij.inverse(jnp.array(v))
        assert np.isfinite(float(raw))
        np.testing.assert_allclose(float(bij(raw)), v, rtol=1e-6)
    # x >= 20 branch: identity
    np.testing.assert_allclose(float(bij.inverse(jnp.array(50.0))), 50.0)


def test_exp_bijector_and_lower_bound():
    bij = positive(lower=0.1, base="exp")
    raw = bij.inverse(jnp.array(1.5))
    np.testing.assert_allclose(float(bij(raw)), 1.5, rtol=1e-6)
    assert float(bij(jnp.array(-100.0))) >= 0.1


# ---------------------------------------------------------------------------
# priors
# ---------------------------------------------------------------------------

def _kl_dense_reference(k_ii, q_mu, q_sqrt, quad_scale=1.0):
    """Dense-formula KL as written in spax/priors.py:36-41 (numpy)."""
    C, I = q_mu.shape
    k_inv = np.linalg.inv(k_ii)
    q_sigma = np.stack([np.diag(q_sqrt[c]) for c in range(C)])
    logdet_k = np.linalg.slogdet(k_ii)[1] * C
    logdet_q = sum(np.linalg.slogdet(q_sigma[c])[1] for c in range(C))
    tr = sum(np.trace(k_inv @ q_sigma[c]) for c in range(C))
    quad = np.einsum("ci,ij,jc->", q_mu, k_inv, q_mu.T)
    return 0.5 * ((logdet_k - logdet_q) - I * C + tr + quad * quad_scale)


def test_gaussian_prior_kl_matches_dense_formula():
    rng = np.random.RandomState(0)
    I, C = 8, 3
    a = rng.randn(I, I)
    k_ii = (a @ a.T / I + 0.1 * np.eye(I)).astype(np.float32)
    q_mu = rng.randn(C, I).astype(np.float32)
    q_sqrt = np.abs(rng.randn(C, I)).astype(np.float32) + 0.5

    prior = GaussianPrior()
    got = float(prior.kl_divergence(
        {}, jnp.asarray(k_ii), jnp.asarray(np.linalg.inv(k_ii)),
        jnp.asarray(q_mu), jnp.asarray(q_sqrt), I, C))
    np.testing.assert_allclose(got, _kl_dense_reference(k_ii, q_mu, q_sqrt),
                               rtol=1e-4)


def test_invgamma_prior_kl_matches_dense_formula():
    rng = np.random.RandomState(1)
    I, C = 6, 2
    a = rng.randn(I, I)
    k_ii = (a @ a.T / I + 0.1 * np.eye(I)).astype(np.float32)
    q_mu = rng.randn(C, I).astype(np.float32)
    q_sqrt = np.abs(rng.randn(C, I)).astype(np.float32) + 0.5

    alpha, beta = 2.0, 3.0
    prior = InverseGammaPrior(alpha, beta)
    params = prior.init_params()
    # trained values == init values here
    av, bv = alpha, beta
    from scipy.special import gammaln, digamma
    ig = (alpha * np.log(bv / beta) - gammaln(av) + gammaln(alpha)
          + (av - alpha) * digamma(av) + (beta - bv) * (av / bv))
    expect = _kl_dense_reference(k_ii, q_mu, q_sqrt, quad_scale=av / bv) + ig
    got = float(prior.kl_divergence(
        params, jnp.asarray(k_ii), jnp.asarray(np.linalg.inv(k_ii)),
        jnp.asarray(q_mu), jnp.asarray(q_sqrt), I, C))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_gaussian_prior_sampling_moments():
    prior = GaussianPrior()
    mean = jnp.array([[0.5, -1.0]])
    cov = jnp.array([[[1.0, 0.3], [0.3, 0.5]]])
    s = prior.sample_f({}, jax.random.PRNGKey(0), mean, cov, 40000)  # [1,2,S]
    emp = np.cov(np.asarray(s[0]))
    np.testing.assert_allclose(emp, np.asarray(cov[0]), atol=0.02)
    np.testing.assert_allclose(np.asarray(s[0]).mean(axis=1),
                               np.asarray(mean[0]), atol=0.02)


# ---------------------------------------------------------------------------
# likelihoods
# ---------------------------------------------------------------------------

def test_student_t_marginal_vs_scipy():
    lik = StudentTLikelihood(2.0, 3.0)
    params = lik.init_params()
    rng = np.random.RandomState(2)
    a = rng.randn(7, 7)
    cov = (a @ a.T / 7 + 0.2 * np.eye(7)).astype(np.float32)
    y = rng.randn(7).astype(np.float32)
    got = float(lik.prior_logpdf(params, jnp.asarray(y), jnp.asarray(cov)))
    expect = osp.multivariate_t.logpdf(y, np.zeros(7), (3.0 / 2.0) * cov, 4.0)
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_student_t_predictive_formula():
    lik = StudentTLikelihood(2.0, 2.0)
    params = lik.init_params()
    rng = np.random.RandomState(3)
    n, m = 10, 4
    a = rng.randn(n, n)
    cov_data = (a @ a.T / n + 0.3 * np.eye(n)).astype(np.float32)
    y_data = rng.randn(n).astype(np.float32)
    c = rng.randn(m, m)
    cov = (c @ c.T / m + 0.2 * np.eye(m)).astype(np.float32)
    mean = rng.randn(m).astype(np.float32)
    x = rng.randn(m).astype(np.float32)

    got = np.asarray(lik.logpdf(params, jnp.asarray(x), jnp.asarray(mean),
                                jnp.asarray(cov), (jnp.asarray(cov_data),
                                                   jnp.asarray(y_data))))
    # Dense reference (spax/likelihoods.py:52-65): inv-based.
    ba = 1.0
    df = 4.0
    cond_df = df + n
    inv = np.linalg.inv(ba * cov_data + 1e-6 * np.eye(n))
    d = df + y_data @ inv @ y_data
    sigma = np.sqrt(np.diag(d / cond_df * ba * cov))
    expect = osp.t.logpdf(x, cond_df, mean, sigma)
    np.testing.assert_allclose(got, expect, rtol=2e-4)


# ---------------------------------------------------------------------------
# SPR / SVSP
# ---------------------------------------------------------------------------

def _toy_spr(method="gp"):
    rng = np.random.RandomState(4)
    x = rng.randn(16, 3).astype(np.float32)
    y = rng.randn(16).astype(np.float32)

    def get_kernel_fn(w, b, l):
        return arch.get_mlp_kernel(2, act="relu", w_std=w, b_std=b, last_w_std=l)

    kernel = NNGPKernel(get_kernel_fn, 1.0, 0.5, 1.0)
    lik = GaussianLikelihood() if method == "gp" else StudentTLikelihood(2.0, 2.0)
    model = SPR(kernel, lik, x, y, jnp.array(0.0), jnp.array(1.0), eps=1e-4)
    return model, x, y


def test_spr_gp_loss_matches_dense_mvn():
    model, x, y = _toy_spr("gp")
    params = model.init_params()
    loss = float(model.loss(params))

    kfn = arch.get_mlp_kernel(2, act="relu", w_std=1.0, b_std=0.5, last_w_std=1.0)
    K = np.asarray(kfn(x, x, get="nngp"), np.float64) + 1e-4 * np.eye(16)
    expect = -osp.multivariate_normal.logpdf(y, np.zeros(16), K) / 16
    np.testing.assert_allclose(loss, expect, rtol=1e-4)


def test_spr_tp_loss_matches_dense_mvt():
    model, x, y = _toy_spr("tp")
    params = model.init_params()
    loss = float(model.loss(params))

    kfn = arch.get_mlp_kernel(2, act="relu", w_std=1.0, b_std=0.5, last_w_std=1.0)
    K = np.asarray(kfn(x, x, get="nngp"), np.float64) + 1e-4 * np.eye(16)
    expect = -osp.multivariate_t.logpdf(y, np.zeros(16), K, 4.0) / 16
    np.testing.assert_allclose(loss, expect, rtol=1e-4)


def test_spr_loss_grad_finite_and_matches_fd():
    model, _, _ = _toy_spr("tp")
    params = model.init_params()
    grads = jax.grad(model.loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # finite-difference check on w_std raw value
    eps = 1e-3
    p_plus = jax.tree_util.tree_map(lambda v: v, params)
    p_plus["kernel"] = dict(params["kernel"])
    p_plus["kernel"]["w_std"] = params["kernel"]["w_std"] + eps
    p_minus = jax.tree_util.tree_map(lambda v: v, params)
    p_minus["kernel"] = dict(params["kernel"])
    p_minus["kernel"]["w_std"] = params["kernel"]["w_std"] - eps
    fd = (float(model.loss(p_plus)) - float(model.loss(p_minus))) / (2 * eps)
    np.testing.assert_allclose(float(grads["kernel"]["w_std"]), fd, rtol=2e-2)


def test_spr_test_nll_runs_gp_and_tp():
    for method in ["gp", "tp"]:
        model, x, y = _toy_spr(method)
        params = model.init_params()
        xt = np.random.RandomState(5).randn(5, 3).astype(np.float32)
        yt = np.random.RandomState(6).randn(5).astype(np.float32)
        nll = float(model.test_nll(params, jnp.asarray(xt), jnp.asarray(yt)))
        assert np.isfinite(nll)


def _toy_svsp(method="svgp"):
    rng = np.random.RandomState(7)
    C, I = 3, 6
    z = rng.randn(I, 4).astype(np.float32)

    def get_kernel_fn(w, b, l):
        return arch.get_mlp_kernel(1, C, "relu", w_std=w, b_std=b, last_w_std=l)

    kernel = NNGPKernel(get_kernel_fn, 1.0, 0.3, 1.0)
    prior = GaussianPrior() if method == "svgp" else InverseGammaPrior(2.0, 2.0)
    return SVSP(prior, kernel, z, num_latent_gps=C, eps=1e-4)


@pytest.mark.slow
def test_svsp_loss_and_test_path():
    rng = np.random.RandomState(8)
    x = rng.randn(9, 4).astype(np.float32)
    y = rng.randint(3, size=9)
    for method in ["svgp", "svtp"]:
        model = _toy_svsp(method)
        params = model.init_params()
        loss = model.loss(params, jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray(y), 100, 64)
        assert np.isfinite(float(loss))
        grads = jax.grad(model.loss)(params, jax.random.PRNGKey(0),
                                     jnp.asarray(x), jnp.asarray(y), 100, 16)
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))
        nll, cc = model.test_acc_nll(params, jax.random.PRNGKey(1),
                                     jnp.asarray(x), jnp.asarray(y), 128)
        assert np.isfinite(float(nll))
        assert 0 <= int(cc) <= 9


def test_svsp_singular_inducing_gram_stays_finite():
    """Round-5 NaN regression: duplicate inducing points make k_ii exactly
    singular, so cholesky(k_ii + relative-reg I) NaNs in fp32 (the relative
    regularizer scales with the tiny Gram diagonal). The eigh-based
    relative solve (nt's predict semantics) must keep loss/test finite —
    this reproduces the design-scale synthetic32 valid-path NaN
    (RESULTS.md round 5)."""
    rng = np.random.RandomState(11)
    C, I = 3, 8
    z = rng.randn(I // 2, 4).astype(np.float32)
    # Near-duplicates: k_ii's smallest eigenvalues land in fp32 rounding
    # noise (slightly negative), the observed design-scale condition. Exact
    # duplicates would additionally -inf the KL's slogdet — a degeneracy the
    # reference shares, so out of contract.
    z = np.concatenate([z, z + 1e-4 * rng.randn(I // 2, 4).astype(np.float32)],
                       axis=0)

    def get_kernel_fn(w, b, l):
        # Tiny output scale -> tiny Gram diagonal -> relative reg ~1e-8,
        # far below the fp32 indefiniteness of the duplicated Gram.
        return arch.get_mlp_kernel(1, C, "relu", w_std=w, b_std=b, last_w_std=l)

    kernel = NNGPKernel(get_kernel_fn, 1.0, 0.01, 0.1)
    model = SVSP(InverseGammaPrior(2.0, 2.0), kernel, z,
                 num_latent_gps=C, eps=1e-6)
    params = model.init_params()
    x = rng.randn(7, 4).astype(np.float32)
    y = rng.randint(C, size=7)

    nll, cc = model.test_acc_nll(params, jax.random.PRNGKey(2),
                                 jnp.asarray(x), jnp.asarray(y), 64)
    assert np.isfinite(float(nll))
    assert 0 <= int(cc) <= 7
    loss, grads = jax.value_and_grad(model.loss)(
        params, jax.random.PRNGKey(3), jnp.asarray(x), jnp.asarray(y), 100, 32)
    assert np.isfinite(float(loss))
    # Training-path regression (round 5, second NaN): the sampler Cholesky
    # of the [C, B, B] posterior covariance and the backward through the
    # eigh pseudo-inverse must both stay finite on the degenerate Gram.
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_psd_safety_lift():
    from snngp.ops.linalg import psd_safety_lift

    rng = np.random.RandomState(5)
    a = rng.randn(12, 12).astype(np.float32)
    psd = a @ a.T + 12 * np.eye(12, dtype=np.float32)
    # Healthy matrix: bit-exact no-op.
    np.testing.assert_array_equal(np.asarray(psd_safety_lift(jnp.asarray(psd))),
                                  psd)

    # Indefinite matrix (the design-scale sampling-cov condition, min eig
    # ~ -1e-4 against max eig ~ 3.5): lifted to a factorizable spectrum.
    q, _ = np.linalg.qr(rng.randn(64, 64))
    evals = np.linspace(1e-6, 3.5, 64)
    evals[0] = -1.1e-4
    bad = ((q * evals) @ q.T).astype(np.float32)
    assert not np.isfinite(np.asarray(jnp.linalg.cholesky(jnp.asarray(bad)))).all()
    lifted = psd_safety_lift(jnp.asarray(bad), mult=64)
    chol = np.asarray(jnp.linalg.cholesky(lifted))
    assert np.isfinite(chol).all()
    # Lift is stop-gradient: d sum(lift(A) @ v)/dA is finite and equals the
    # unlifted linear map's gradient.
    v = jnp.asarray(rng.randn(64).astype(np.float32))
    g = jax.grad(lambda m: jnp.sum(psd_safety_lift(m, mult=64) @ v))(
        jnp.asarray(bad))
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g), np.tile(np.asarray(v), (64, 1)),
                               rtol=1e-6)


def test_pinv_psd_eigh_custom_jvp_matches_inverse_rule():
    """grad through pinv_psd_eigh must follow d(A^-1) = -A^-1 dA A^-1 (and
    never route through eigh's 1/(li-lj) eigenvector JVP, which NaNs on the
    clustered near-zero spectra of design-scale inducing Grams)."""
    from snngp.ops.linalg import pinv_psd_eigh

    rng = np.random.RandomState(8)
    a = rng.randn(6, 6)
    psd = (a @ a.T + 6 * np.eye(6)).astype(np.float32)
    w = jnp.asarray(rng.randn(6, 6).astype(np.float32))

    got = jax.grad(lambda m: jnp.sum(pinv_psd_eigh(m) * w))(jnp.asarray(psd))
    inv = np.linalg.inv(psd.astype(np.float64))
    expect = -(inv @ np.asarray(w, np.float64) @ inv)
    np.testing.assert_allclose(np.asarray(got), expect, atol=1e-4)

    # Clustered tiny spectrum: eigh's own JVP produces non-finite values;
    # the inverse-rule JVP stays finite and bounded.
    q, _ = np.linalg.qr(rng.randn(16, 16))
    evals = np.full(16, 1e-7)
    evals[-1] = 2.0
    bad = ((q * evals) @ q.T).astype(np.float32)
    g = jax.grad(lambda m: jnp.sum(pinv_psd_eigh(m) ** 2))(jnp.asarray(bad))
    assert np.isfinite(np.asarray(g)).all()


def test_pinv_psd_eigh_matches_inverse_and_bounds_indefinite():
    from snngp.ops.linalg import pinv_psd_eigh

    rng = np.random.RandomState(12)
    a = rng.randn(16, 16).astype(np.float32)
    psd = a @ a.T + 16 * np.eye(16, dtype=np.float32)
    got = np.asarray(pinv_psd_eigh(jnp.asarray(psd)))
    np.testing.assert_allclose(got, np.linalg.inv(psd.astype(np.float64)),
                               atol=1e-5)

    # Indefinite input (min eig < 0): the Cholesky path (what SVSP used
    # before round 5) NaNs; the eigh path must stay finite with a bounded
    # pseudo-inverse.
    q, _ = np.linalg.qr(rng.randn(16, 16))
    evals = np.linspace(1.0, 2.0, 16)
    evals[0] = -1e-7
    bad = (q * evals) @ q.T
    chol = np.asarray(jnp.linalg.cholesky(jnp.asarray(bad, jnp.float32)))
    assert not np.isfinite(chol).all()          # the old failure mode
    got = np.asarray(pinv_psd_eigh(jnp.asarray(bad, jnp.float32)))
    assert np.isfinite(got).all()
    assert np.abs(got).max() < 1.0 / (2.0 * np.finfo(np.float32).eps)


def test_svsp_posterior_cov_matches_dense():
    """B_B must equal k_bb - k_bi (k_ii + r I)^{-1} k_ib with relative r."""
    model = _toy_svsp("svgp")
    params = model.init_params()
    rng = np.random.RandomState(9)
    x = rng.randn(5, 4).astype(np.float32)

    a_b, b_b, _, _, k_ii, k_ii_inv, _, _ = model._posterior_pieces(params, jnp.asarray(x))
    kfn = arch.get_mlp_kernel(1, 3, "relu", w_std=1.0, b_std=0.3, last_w_std=1.0)
    z = np.asarray(params["inducing_variable"])
    K_bi = np.asarray(kfn(x, z, get="nngp"), np.float64)
    K_ii = np.asarray(kfn(z, z, get="nngp"), np.float64)
    K_bb = np.asarray(kfn(x, x, get="nngp"), np.float64)
    eps = 1e-4
    r = eps * np.trace(K_ii) / K_ii.shape[0]
    expect_bb = K_bb - K_bi @ np.linalg.inv(K_ii + r * np.eye(6)) @ K_bi.T
    np.testing.assert_allclose(np.asarray(b_b), expect_bb, atol=1e-5)
    expect_ab = K_bi @ np.linalg.inv(K_ii + eps * np.eye(6))
    np.testing.assert_allclose(np.asarray(a_b), expect_ab, atol=1e-4)


# ---------------------------------------------------------------------------
# params substrate
# ---------------------------------------------------------------------------

def test_named_leaves_and_suffix_ops():
    params = {"kernel": {"w_std": jnp.array(1.0), "b_std": jnp.array(2.0)},
              "eps": jnp.array(3.0)}
    names = [n for n, _ in P.named_leaves(params)]
    assert names == ["eps", "kernel.b_std", "kernel.w_std"]
    named = dict(P.named_leaves(params))
    assert float(P.get_by_suffix(named, "w_std")) == 1.0
    assert P.get_by_suffix(named, "nope") is None
    assert P.assign_by_suffix(params, "w_std", 9.0)
    assert float(params["kernel"]["w_std"]) == 9.0


def test_gaussian_kl_matches_monte_carlo():
    """SURVEY §4: KL formula vs direct MC estimate of E_q[log q - log p]."""
    rng = np.random.RandomState(21)
    I, C = 5, 2
    a = rng.randn(I, I)
    k_ii = (a @ a.T / I + 0.5 * np.eye(I)).astype(np.float64)
    q_mu = rng.randn(C, I)
    q_sqrt = np.abs(rng.randn(C, I)) + 0.5  # q covariance = diag(q_sqrt)

    prior = GaussianPrior()
    got = float(prior.kl_divergence(
        {}, jnp.asarray(k_ii, jnp.float32),
        jnp.asarray(np.linalg.inv(k_ii), jnp.float32),
        jnp.asarray(q_mu, jnp.float32), jnp.asarray(q_sqrt, jnp.float32), I, C))

    total = 0.0
    S = 200000
    for c in range(C):
        qs = osp.multivariate_normal(q_mu[c], np.diag(q_sqrt[c]))
        ps = osp.multivariate_normal(np.zeros(I), k_ii)
        draws = qs.rvs(size=S, random_state=rng)
        total += np.mean(qs.logpdf(draws) - ps.logpdf(draws))
    np.testing.assert_allclose(got, total, rtol=2e-2)


def test_inverse_gamma_kl_term_matches_quadrature():
    """The closed-form KL(IG(a,b) || IG(alpha,beta)) term vs scipy quadrature."""
    from scipy import integrate
    from scipy.stats import invgamma as ig

    alpha, beta = 2.0, 3.0   # fixed prior
    a, b = 1.4, 2.2          # variational

    def integrand(x):
        qx = ig.pdf(x, a, scale=b)
        return qx * (ig.logpdf(x, a, scale=b) - ig.logpdf(x, alpha, scale=beta))

    expect, err = integrate.quad(integrand, 1e-9, np.inf, limit=200)
    assert err < 1e-7

    from scipy.special import gammaln, digamma
    got = (alpha * np.log(b / beta) - gammaln(a) + gammaln(alpha)
           + (a - alpha) * digamma(a) + (beta - b) * (a / b))
    np.testing.assert_allclose(got, expect, rtol=1e-6)
