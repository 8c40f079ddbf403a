"""Priors over the latent function (rebuilds ``spax/priors.py``).

- :class:`GaussianPrior`: MVN sampling + Gaussian KL(q||p) -> SVGP.
- :class:`InverseGammaPrior`: inverse-gamma mixing over the function scale;
  sampling becomes Student-t with df = 2a and scale (b/a) * cov, and the KL
  gains closed-form inverse-gamma terms -> SVTP (the scale-mixture result).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import random
from jax.scipy.special import digamma, gammaln

from snngp.models import params as P
from snngp.models.bijectors import positive
from snngp.ops import multivariate_t

__all__ = ["Prior", "GaussianPrior", "InverseGammaPrior"]


def _common_kl_terms(k_ii, k_ii_inv, q_mu, q_sqrt, num_inducing, num_class):
    """Shared Gaussian KL pieces, with q_sigma = diag(q_sqrt) per class
    (``spax/models.py:35``: the variational covariance is the *diagonal matrix
    of q_sqrt values*, not its square — semantics preserved).

    Returns (logdet terms) - IC + trace + quad as in ``spax/priors.py:36-41``,
    except the quadratic form, which differs between priors.
    """
    logdet_k = _logdet_psd(k_ii) * num_class
    logdet_q = jnp.sum(jnp.log(q_sqrt))
    tr = jnp.sum(jnp.diagonal(k_ii_inv)[None, :] * q_sqrt)
    quad = jnp.einsum("ci,ij,cj->", q_mu, k_ii_inv, q_mu)
    return logdet_k, logdet_q, tr, quad


def _logdet_psd(mat):
    # slogdet (LU-based), matching the reference's logdet (spax/utils.py:38-40):
    # stays finite on numerically non-PSD Grams where a Cholesky would NaN the
    # whole ELBO.
    sign, abslogdet = jnp.linalg.slogdet(mat)
    return sign * abslogdet


class Prior:
    def init_params(self) -> Dict[str, jax.Array]:
        return {}


class GaussianPrior(Prior):
    def sample_f(self, params, key, mean, cov, num_samples):
        """Full-covariance MVN draws -> [C, B, S] (spax/priors.py:22-26)."""
        num_class = mean.shape[0]
        sampled = random.multivariate_normal(key, mean, cov, shape=(num_samples, num_class))
        return sampled.transpose(1, 2, 0)

    def sample_f_iid(self, params, key, mean, cov, num_samples):
        """Diagonal (marginal) draws -> [C, B, S] (spax/priors.py:28-34).

        The diagonal is clamped at 0 before the sqrt: fp32 posterior
        covariances on near-rank-1 design-scale Grams can carry slightly
        negative marginal variances (Schur-complement round-off), where the
        reference's unguarded sqrt NaNs the predictive.
        """
        num_class, num_batch = mean.shape
        sigma = jnp.sqrt(jnp.maximum(
            jnp.diagonal(cov, axis1=-2, axis2=-1), 0.0))
        eps = random.normal(key, shape=(num_class, num_batch, num_samples))
        return eps * sigma[..., None] + mean[..., None]

    def kl_divergence(self, params, k_ii, k_ii_inv, q_mu, q_sqrt, num_inducing, num_class):
        """KL(q || GP prior) (spax/priors.py:36-41)."""
        logdet_k, logdet_q, tr, quad = _common_kl_terms(
            k_ii, k_ii_inv, q_mu, q_sqrt, num_inducing, num_class)
        return 0.5 * ((logdet_k - logdet_q) - num_inducing * num_class + tr + quad)


class InverseGammaPrior(Prior):
    """Inverse-gamma mixing with trainable (a, b); fixed prior (alpha, beta)."""

    def __init__(self, alpha: float, beta: float):
        self.alpha = alpha
        self.beta = beta
        self.bij = positive()

    def init_params(self):
        return {
            "a": P.constrained_init(self.alpha, self.bij),
            "b": P.constrained_init(self.beta, self.bij),
        }

    def _ab(self, params):
        return (P.constrained_read(params["a"], self.bij),
                P.constrained_read(params["b"], self.bij))

    def sample_f(self, params, key, mean, cov, num_samples):
        """Student-t draws, df = 2a, scale (b/a) cov (spax/priors.py:52-58)."""
        a, b = self._ab(params)
        num_class = mean.shape[0]
        sampled = multivariate_t(key, 2 * a, mean, (b / a) * cov,
                                 shape=(num_samples, num_class))
        return sampled.transpose(1, 2, 0)

    def sample_f_iid(self, params, key, mean, cov, num_samples):
        """Marginal t draws (spax/priors.py:60-68). Diagonal clamped at 0
        before the sqrt (see GaussianPrior.sample_f_iid)."""
        a, b = self._ab(params)
        num_class, num_batch = mean.shape
        sigma = jnp.sqrt(jnp.maximum(
            jnp.diagonal((b / a) * cov, axis1=-2, axis2=-1), 0.0))
        eps = random.t(key, 2 * a, shape=(num_class, num_batch, num_samples))
        return eps * sigma[..., None] + mean[..., None]

    def kl_divergence(self, params, k_ii, k_ii_inv, q_mu, q_sqrt, num_inducing, num_class):
        """Gaussian KL with the quad term scaled by a/b, plus the closed-form
        KL between inverse-gamma mixing distributions (spax/priors.py:70-82)."""
        a, b = self._ab(params)
        a_by_b = a / b
        logdet_k, logdet_q, tr, quad = _common_kl_terms(
            k_ii, k_ii_inv, q_mu, q_sqrt, num_inducing, num_class)
        gauss = 0.5 * ((logdet_k - logdet_q) - num_inducing * num_class
                       + tr + quad * a_by_b)
        ig = (self.alpha * jnp.log(b / self.beta)
              - gammaln(a) + gammaln(self.alpha)
              + (a - self.alpha) * digamma(a)
              + (self.beta - b) * a_by_b)
        return gauss + ig

    # Explicit-(a, b) variants (spax/priors.py:84-102), used by grid searches.
    def sample_f2(self, key, mean, cov, num_samples, a, b):
        num_class = mean.shape[0]
        sampled = multivariate_t(key, 2 * a, mean, (b / a) * cov,
                                 shape=(num_samples, num_class))
        return sampled.transpose(1, 2, 0)

    def kl_divergence2(self, k_ii, k_ii_inv, q_mu, q_sqrt, num_inducing, num_class, a, b):
        a_by_b = a / b
        logdet_k, logdet_q, tr, quad = _common_kl_terms(
            k_ii, k_ii_inv, q_mu, q_sqrt, num_inducing, num_class)
        gauss = 0.5 * ((logdet_k - logdet_q) - num_inducing * num_class
                       + tr + quad * a_by_b)
        ig = (self.alpha * jnp.log(b / self.beta)
              - gammaln(a) + gammaln(self.alpha)
              + (a - self.alpha) * digamma(a)
              + (self.beta - b) * a_by_b)
        return gauss + ig
