"""Bijectors constraining trainable hyperparameters to be positive.

Rebuilds ``spax/bijectors.py`` semantics: parameters are *stored*
unconstrained and *read* through the bijector (see
:mod:`snngp.models.params`), including the numerically-safe softplus inverse
``log(expm1(x))`` guarded to identity for x >= 20 (``spax/bijectors.py:51-53``).
"""

from __future__ import annotations

import abc
from typing import Optional

import jax.numpy as jnp
from jax import nn

__all__ = ["Bijector", "Exp", "Softplus", "positive", "triangular"]

DEFAULT_POSITIVE_MINIMUM = 0.0
DEFAULT_POSITIVE_BIJECTOR = "softplus"


class Bijector(abc.ABC):
    @abc.abstractmethod
    def __call__(self, x):
        ...

    @abc.abstractmethod
    def inverse(self, x):
        ...


class PositiveBijector(Bijector):
    def __init__(self, lower: float = 0.0):
        self.lower = lower

    def __call__(self, x):
        return self.lower + self._base(x)

    def inverse(self, x):
        return self._base_inv(x - self.lower)


class Exp(PositiveBijector):
    def _base(self, x):
        return jnp.exp(x)

    def _base_inv(self, x):
        return jnp.log(x)


class Softplus(PositiveBijector):
    def _base(self, x):
        return nn.softplus(x)

    def _base_inv(self, x):
        # log(expm1(x)) overflows for large x; softplus(x) ~ x for x >= 20.
        return jnp.where(x < 20.0, jnp.log(jnp.expm1(jnp.where(x < 20.0, x, 1.0))), x)


def positive(lower: Optional[float] = None, base: Optional[str] = None) -> PositiveBijector:
    lower_bound = lower if lower is not None else DEFAULT_POSITIVE_MINIMUM
    name = (base if base is not None else DEFAULT_POSITIVE_BIJECTOR).lower()
    if name == "exp":
        return Exp(lower_bound)
    if name == "softplus":
        return Softplus(lower_bound)
    raise KeyError(f"Unsupported bijector '{name}'")


def triangular():
    raise NotImplementedError
