"""Multivariate Student-t primitives.

Semantics-compatible rebuild of the reference's forked sampler / logpdf
(``spax/utils.py:94-140`` and ``:160-183``), written against public JAX APIs.

Sampler quirk preserved on purpose: the reference draws *i.i.d.* univariate
Student-t coordinates and correlates them through a factor of ``cov``
(``mean + factor @ t_iid``), rather than the textbook multivariate-t (which
shares one chi-square mixing variable across coordinates). The scale-mixture
training objective depends on this construction, so we replicate it exactly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import gammaln

__all__ = ["multivariate_t", "multivariate_t_logpdf"]


def multivariate_t(
    key: jax.Array,
    df,
    mean: jax.Array,
    cov: jax.Array,
    shape: Optional[Sequence[int]] = None,
    dtype=None,
    method: str = "cholesky",
) -> jax.Array:
    """Correlated Student-t draws: ``mean + factor(cov) @ t_iid(df)``.

    Matches ``spax/utils.py:94-140`` (itself a fork of
    ``jax.random.multivariate_normal`` with the Gaussian innovations replaced
    by Student-t innovations).
    """
    if method not in {"svd", "eigh", "cholesky"}:
        raise ValueError("method must be one of {'svd', 'eigh', 'cholesky'}")
    if mean.ndim < 1:
        raise ValueError("multivariate_t requires mean.ndim >= 1")
    if cov.ndim < 2:
        raise ValueError("multivariate_t requires cov.ndim >= 2")
    n = mean.shape[-1]
    if cov.shape[-2:] != (n, n):
        raise ValueError(f"cov.shape {cov.shape} incompatible with mean dim {n}")
    if shape is None:
        shape = lax.broadcast_shapes(mean.shape[:-1], cov.shape[:-2])
    else:
        # shape is the full result batch shape; must be broadcast-compatible
        # with mean/cov batch dims (jax.random._check_shape semantics).
        shape = tuple(shape)
        lax.broadcast_shapes(shape, mean.shape[:-1], cov.shape[:-2])

    if method == "svd":
        (u, s, _) = jnp.linalg.svd(cov)
        factor = u * jnp.sqrt(s[..., None, :])
    elif method == "eigh":
        (w, v) = jnp.linalg.eigh(cov)
        factor = v * jnp.sqrt(w[..., None, :])
    else:
        factor = jnp.linalg.cholesky(cov)

    t_samples = jax.random.t(key, df, shape + (n,), dtype or mean.dtype)
    return mean + jnp.einsum("...ij,...j->...i", factor, t_samples)


def multivariate_t_logpdf(x: jax.Array, loc, shape_mat: jax.Array, df,
                          chol_fn=None) -> jax.Array:
    """Multivariate Student-t log-density (``spax/utils.py:160-183``).

    log p(x) = -((df+n)/2) log(1 + (1/df) y^T y) - (n/2) log(df pi)
               + lgamma((df+n)/2) - lgamma(df/2) - sum log diag(L)
    with L = chol(shape) and y = L^{-1}(x - loc).
    """
    n = x.shape[-1]
    half = 0.5 * (df + n)
    chol = (chol_fn or jnp.linalg.cholesky)(shape_mat)
    diff = x - loc
    # Solve L y = diff along the last axis (batched over any leading dims).
    y = lax.linalg.triangular_solve(chol, diff, lower=True, transpose_a=True)
    quad = jnp.einsum("...i,...i->...", y, y)
    return (
        -half * jnp.log1p(quad / df)
        - 0.5 * n * jnp.log(df * jnp.pi)
        + gammaln(half)
        - gammaln(0.5 * df)
        - jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
    )
