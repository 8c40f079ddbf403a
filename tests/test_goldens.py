"""Pinned numeric goldens on fixed tiny configs (SURVEY.md §4 "parity/golden").

These freeze the numerical behavior of the core losses so later performance
work (kernel rewrites, sharding changes) cannot silently shift numerics.
Generated on CPU fp32-highest from the reference-tier recursion; tolerance
1e-5 relative (the BASELINE.md parity bar).
"""

import jax
import jax.numpy as jnp
import numpy as np

from snngp.models import (
    SPR, SVSP, NNGPKernel, GaussianLikelihood, StudentTLikelihood,
    GaussianPrior, InverseGammaPrior,
)
from snngp.nn import arch


def _data(n, d, seed):
    rng = np.random.RandomState(seed)
    return (rng.randn(n, d).astype(np.float32),
            rng.randn(n).astype(np.float32))


def _spr(method):
    x, y = _data(24, 5, 42)

    def gkf(w, b, l):
        return arch.get_mlp_kernel(3, act="relu", w_std=w, b_std=b, last_w_std=l)

    kernel = NNGPKernel(gkf, 1.2, 0.4, 0.9)
    lik = GaussianLikelihood() if method == "gp" else StudentTLikelihood(2.0, 3.0)
    return SPR(kernel, lik, x, y, jnp.array(0.5), jnp.array(2.0), eps=1e-3)


def test_spr_gp_loss_golden():
    model = _spr("gp")
    loss = float(model.loss(model.init_params()))
    np.testing.assert_allclose(loss, 29.772715, rtol=1e-5)


def test_spr_tp_loss_golden():
    model = _spr("tp")
    loss = float(model.loss(model.init_params()))
    np.testing.assert_allclose(loss, 2.2890577, rtol=1e-5)


def test_spr_tp_test_nll_golden():
    model = _spr("tp")
    xt, yt = _data(7, 5, 43)
    nll = float(model.test_nll(model.init_params(), jnp.asarray(xt), jnp.asarray(yt)))
    np.testing.assert_allclose(nll, 3.0079527, rtol=1e-5)


def test_svsp_losses_golden():
    rng = np.random.RandomState(7)
    z = rng.randn(8, 4).astype(np.float32)
    xb = rng.randn(10, 4).astype(np.float32)
    yb = rng.randint(3, size=10)

    def gkf(w, b, l):
        return arch.get_mlp_kernel(2, 3, "relu", w_std=w, b_std=b, last_w_std=l)

    expected = {"svgp": 5.8916473, "svtp": 6.1968679}
    for method, want in expected.items():
        kernel = NNGPKernel(gkf, 1.0, 0.3, 1.0)
        prior = GaussianPrior() if method == "svgp" else InverseGammaPrior(2.0, 2.0)
        model = SVSP(prior, kernel, z, num_latent_gps=3, eps=1e-4)
        loss = float(model.loss(model.init_params(), jax.random.PRNGKey(0),
                                jnp.asarray(xb), jnp.asarray(yb), 100, 32))
        np.testing.assert_allclose(loss, want, rtol=1e-5, err_msg=method)
