"""Regression likelihoods (rebuilds ``spax/likelihoods.py``).

- :class:`GaussianLikelihood` -> exact GP regression.
- :class:`StudentTLikelihood` -> Student-t process (the scale-mixture result):
  marginal is multivariate-t with df = 2a and scale (b/a) K; the predictive is
  a conditional-t with df + N degrees of freedom and the data-dependent scale
  inflation d / (df + N) requiring a solve against (b/a) K_train + jitter.

All heavy inverses from the reference are replaced by Cholesky solves.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.scipy import stats

from snngp.models import params as P
from snngp.models.bijectors import positive
from snngp.ops import multivariate_t_logpdf, mvn_logpdf
from snngp.ops.linalg import add_jitter, chol_quad_form

__all__ = ["Likelihood", "GaussianLikelihood", "StudentTLikelihood"]


class Likelihood:
    require = None

    def init_params(self) -> Dict[str, jax.Array]:
        return {}


class GaussianLikelihood(Likelihood):
    require = None

    def __init__(self, chol_fn=None):
        # chol_fn swaps in a distributed factorization on a mesh (D3).
        self.chol_fn = chol_fn

    def prior_logpdf(self, params, x, cov):
        """Zero-mean MVN marginal log-likelihood (spax/likelihoods.py:25-28)."""
        return mvn_logpdf(x, cov, chol_fn=self.chol_fn)

    def logpdf(self, params, x, mean, cov, aux):
        """Diagonal-Normal predictive density (spax/likelihoods.py:30-33)."""
        sigma = jnp.sqrt(jnp.diag(cov))
        return stats.norm.logpdf(x, mean, sigma)


class StudentTLikelihood(Likelihood):
    require = ["cov_data", "y_data"]

    def __init__(self, alpha: float, beta: float, chol_fn=None):
        self.alpha = alpha
        self.beta = beta
        self.bij = positive()
        self.chol_fn = chol_fn

    def init_params(self):
        return {
            "a": P.constrained_init(self.alpha, self.bij),
            "b": P.constrained_init(self.beta, self.bij),
        }

    def _ab(self, params):
        return (P.constrained_read(params["a"], self.bij),
                P.constrained_read(params["b"], self.bij))

    def prior_logpdf(self, params, x, cov):
        """Multivariate-t marginal, df = 2a, scale (b/a) K
        (spax/likelihoods.py:45-50)."""
        a, b = self._ab(params)
        zero = jnp.zeros_like(x)
        return multivariate_t_logpdf(x, zero, (b / a) * cov, 2 * a,
                                     chol_fn=self.chol_fn)

    def logpdf(self, params, x, mean, cov, aux):
        """Conditional-t predictive (spax/likelihoods.py:52-65):

        df* = 2a + N,  d = 2a + y^T ((b/a) K_dd + jitter)^{-1} y,
        sigma^2 = (d / df*) (b/a) diag(cov).

        The reference materializes ``jnp.linalg.inv``; one triangular solve
        against the Cholesky factor computes the same quadratic form.
        """
        a, b = self._ab(params)
        cov_data, y_data = aux
        num_data = cov_data.shape[-1]

        df = 2 * a
        cond_df = df + num_data
        chol = (self.chol_fn or jnp.linalg.cholesky)(
            add_jitter((b / a) * cov_data, 1e-6))
        d = df + chol_quad_form(chol, y_data)
        sigma = jnp.sqrt(jnp.diag((d / cond_df) * (b / a) * cov))
        return stats.t.logpdf(x, cond_df, mean, sigma)
