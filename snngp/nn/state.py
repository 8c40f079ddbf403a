"""Kernel-state IR for the compositional NNGP/NTK layer recursion.

This replaces ``neural_tangents.stax``'s ``Kernel`` for the architectures used
by the reference (``experiments/nt_kernels.py:21-103``): MLP, CNN, dense
ResNet, conv WideResNet — all of which read out through ``Flatten`` + ``Dense``
(no pooling), so the *matched-pixel* ("diagonal spatial") representation is
exact and sufficient:

- dense inputs  ``[N, D]``:        ``nngp``: ``[N1, N2]``,      ``var``: ``[N]``
- image inputs  ``[N, H, W, C]``:  ``nngp``: ``[N1, N2, H, W]``, ``var``: ``[N, H, W]``

``nngp[i, j, (h, w)]`` is the infinite-width covariance of pre-activations of
input i and input j at the *same* spatial location ``(h, w)``. Convolutions
with i.i.d. weights only couple equal filter offsets across the two inputs, so
the recursion closes on this diagonal (the same observation underlying
``diagonal_spatial=True`` in neural_tangents).

``ntk`` carries the Neural Tangent Kernel through the same recursion (used by
the paper-figure notebook, ``sample.ipynb``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["KernelState", "input_state"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KernelState:
    """Covariance state flowing through the layer recursion.

    nngp: [N1, N2] or [N1, N2, H, W] matched-location covariance.
    var1: [N1] or [N1, H, W] diagonal (self-covariance) of first batch.
    var2: [N2] or [N2, H, W] diagonal of second batch.
    ntk:  NTK with the same shape as nngp, or None when not requested.
    """

    nngp: jax.Array
    var1: jax.Array
    var2: jax.Array
    ntk: Optional[jax.Array] = None

    @property
    def spatial(self) -> bool:
        return self.nngp.ndim == 4


def input_state(x1: jax.Array, x2: Optional[jax.Array], *, ntk: bool = False) -> KernelState:
    """Embed raw inputs as the layer-0 kernel state.

    The layer-0 "kernel" is the per-feature second moment ``x1 . x2 / D`` (for
    images, the channel mean at each matched pixel), matching the NTK
    parameterization used by ``stax.Dense``/``stax.Conv`` (weights scaled by
    ``W_std / sqrt(fan_in)``).
    """
    if x2 is None:
        x2 = x1
    if x1.ndim == 2:
        d = x1.shape[-1]
        nngp = (x1 @ x2.T) / d
        var1 = jnp.sum(x1 * x1, axis=-1) / d
        var2 = jnp.sum(x2 * x2, axis=-1) / d
    elif x1.ndim == 4:
        # [N, H, W, C] -> matched-pixel channel mean.
        nngp = jnp.einsum("ihwc,jhwc->ijhw", x1, x2) / x1.shape[-1]
        var1 = jnp.mean(x1 * x1, axis=-1)
        var2 = jnp.mean(x2 * x2, axis=-1)
    else:
        raise ValueError(f"inputs must be [N, D] or [N, H, W, C]; got {x1.shape}")
    zero_ntk = jnp.zeros_like(nngp) if ntk else None
    return KernelState(nngp=nngp, var1=var1, var2=var2, ntk=zero_ntk)
