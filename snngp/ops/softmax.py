"""Softmax Monte-Carlo likelihood estimators for sampled latent functions.

Rebuilds ``spax/utils.py:47-74``. All take ``sampled_f`` of shape [C, B, S]
(class, batch, sample) and integer labels [B]. Note the deliberate train/test
asymmetry preserved from the reference: training uses mean-of-log (a lower
bound, ``log_likelihood``), testing uses logsumexp-of-log (an unbiased MC
predictive, ``test_log_likelihood``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.nn import log_softmax, logsumexp

__all__ = [
    "get_true_values",
    "log_likelihood",
    "test_log_likelihood",
    "get_correct_count",
]


def get_true_values(value: jax.Array, label: jax.Array) -> jax.Array:
    """Gather value[label[b], b, s] -> [B, S] (spax/utils.py:47-51)."""
    idx = jnp.broadcast_to(label[None, :, None], (1,) + value.shape[1:])
    return jnp.take_along_axis(value, idx, axis=0).squeeze(axis=0)


def log_likelihood(sampled_f: jax.Array, label: jax.Array) -> jax.Array:
    """Training estimator: mean over samples of log-softmax at the true label
    (spax/utils.py:54-58)."""
    true_lsm = get_true_values(log_softmax(sampled_f, axis=0), label)
    return jnp.mean(jnp.mean(true_lsm, axis=0))


def test_log_likelihood(sampled_f: jax.Array, label: jax.Array) -> jax.Array:
    """Test estimator: log mean predictive prob = logsumexp - log S
    (spax/utils.py:61-66)."""
    num_samples = sampled_f.shape[2]
    true_lsm = get_true_values(log_softmax(sampled_f, axis=0), label)
    return jnp.mean(logsumexp(true_lsm, axis=1) - jnp.log(num_samples))


def get_correct_count(sampled_f: jax.Array, label: jax.Array) -> jax.Array:
    """Prediction = argmax over classes of the sample-aggregated log-softmax
    (spax/utils.py:69-74)."""
    lsm = log_softmax(sampled_f, axis=0)
    y_pred = jnp.argmax(logsumexp(lsm, axis=2), axis=0)
    return jnp.sum(y_pred == label)
