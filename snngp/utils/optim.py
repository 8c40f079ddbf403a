"""Optimizers with objax-compatible update semantics (replaces objax.optimizer).

The reference trains with ``objax.optimizer.Adam``/``SGD``
(``experiments/regression/train.py:151-157``). Parity of learned
hyperparameters requires matching objax's exact Adam formulation:

    t <- t + 1
    lr_t = lr * sqrt(1 - beta2^t) / (1 - beta1^t)
    m <- m + (1 - beta1) (g - m)
    v <- v + (1 - beta2) (g^2 - v)
    p <- p - lr_t * m / (sqrt(v) + eps)

(optax's ``adam`` differs in where eps enters the bias correction.)

Optimizers here are pure: ``init(params) -> state``; ``update(grads, state,
params, lr) -> (new_params, new_state)``. A ``mask`` predicate over dotted
parameter names freezes parameters (used e.g. to freeze ``last_w_std`` for
svtp, ``classification/train.py:216``, and for the two-LR split,
``classification/train.py:228-242``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from snngp.models.params import named_leaves

__all__ = ["Adam", "SGD", "name_mask"]


def name_mask(params, predicate: Callable[[str], bool]):
    """Boolean pytree: True where the dotted leaf name satisfies predicate."""
    names = [n for n, _ in named_leaves(params)]
    flat, treedef = jax.tree_util.tree_flatten(params)
    assert len(names) == len(flat)
    return jax.tree_util.tree_unflatten(treedef, [predicate(n) for n in names])


class AdamState(NamedTuple):
    step: jax.Array
    mu: any
    nu: any


class Adam:
    def __init__(self, beta1: float = 0.9, beta2: float = 0.999, eps: float = 1e-8,
                 mask=None):
        self.beta1, self.beta2, self.eps = beta1, beta2, eps
        self.mask = mask

    def init(self, params) -> AdamState:
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros,
                         nu=jax.tree.map(jnp.zeros_like, params))

    def update(self, grads, state: AdamState, params, lr):
        t = state.step + 1
        tf = t.astype(jnp.float32)
        lr_t = lr * jnp.sqrt(1.0 - self.beta2 ** tf) / (1.0 - self.beta1 ** tf)

        mu = jax.tree.map(lambda m, g: m + (1.0 - self.beta1) * (g - m),
                          state.mu, grads)
        nu = jax.tree.map(lambda v, g: v + (1.0 - self.beta2) * (g * g - v),
                          state.nu, grads)

        def step_fn(p, m, v):
            return p - lr_t * m / (jnp.sqrt(v) + self.eps)

        new_params = jax.tree.map(step_fn, params, mu, nu)
        if self.mask is not None:
            new_params = jax.tree.map(
                lambda keep, new, old: new if keep else old,
                self.mask, new_params, params)
        return new_params, AdamState(step=t, mu=mu, nu=nu)


class SGDState(NamedTuple):
    pass


class SGD:
    def __init__(self, mask=None):
        self.mask = mask

    def init(self, params) -> SGDState:
        return SGDState()

    def update(self, grads, state: SGDState, params, lr):
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        if self.mask is not None:
            new_params = jax.tree.map(
                lambda keep, new, old: new if keep else old,
                self.mask, new_params, params)
        return new_params, state
