"""Sharded N x N Gram construction (SURVEY.md D2).

The reference computes the full Gram monolithically via ``kernel_fn(x, x2)``
(``spax/kernels.py:23-27``), OOM-bound at large N. Here the row panels are
distributed over the mesh: each device evaluates the layer recursion for its
row block against the (replicated) full batch, so the O(N^2 depth) hot loop is
data-pair parallel with zero inter-device traffic until the solve stage.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as Pspec
from jax import shard_map

__all__ = ["sharded_gram"]


def sharded_gram(kernel_fn, x: jax.Array, mesh: Mesh, axis_name: str = "data",
                 x2: Optional[jax.Array] = None) -> jax.Array:
    """Row-sharded Gram: K[i, j] = kernel_fn(x_i, x2_j), rows sharded on mesh.

    ``x``'s leading dim must be divisible by the mesh size (pad upstream).
    Returns the Gram with rows sharded over ``axis_name`` (ready to feed the
    distributed Cholesky without a relayout).
    """
    if x2 is None:
        x2 = x

    def local_rows(x_rows, x_all):
        return kernel_fn(x_rows, x_all, get="nngp")

    fn = shard_map(
        local_rows, mesh=mesh,
        in_specs=(Pspec(axis_name), Pspec()),
        out_specs=Pspec(axis_name),
    )
    return fn(x, x2)
