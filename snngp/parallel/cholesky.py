"""Blocked / distributed Cholesky factorization (SURVEY.md D3).

Right-looking blocked algorithm in which every step is expressed as a
full-width masked operation, so that under ``pjit`` with row-sharded operands
XLA partitions the O(N^2 b) trailing update across the mesh and inserts only a
small per-step panel all-gather ([N, b]) over ICI — the kernel-method analogue
of a ring pipeline. Replaces the reference's monolithic
``jnp.linalg.cholesky`` / ``inv`` / ``slogdet`` call sites for large N.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from snngp.parallel.mesh import row_sharding

__all__ = ["blocked_cholesky", "distributed_cholesky"]


@partial(jax.jit, static_argnames=("block",))
def blocked_cholesky(a: jax.Array, block: int = 512) -> jax.Array:
    """Lower Cholesky factor of PSD ``a`` via right-looking block panels.

    The block count is static, so the panel loop unrolls with *statically
    shrinking* trailing updates restricted to the lower-triangular block
    columns (right-looking factorization never reads above the diagonal):
    ~n^3/6 multiplies total — LAPACK potrf's leading term — instead of the
    n^3 a full-width masked update costs or the n^3/3 of a full-square syrk.
    Every step is matmul/solve-shaped (MXU-friendly), and under pjit with
    row-sharded operands GSPMD partitions each trailing update across the
    mesh with one [rest, b] panel all-gather per step over ICI.

    Non-multiple sizes are identity-padded ([[A, 0], [0, I]] factors to
    [[L, 0], [0, I]]) and sliced back. Equivalent to ``jnp.linalg.cholesky``
    up to float error.
    """
    n0 = a.shape[-1]
    block = min(block, n0)
    pad = (-n0) % block
    if pad:
        a = jnp.pad(a, ((0, pad), (0, pad)))
        a = a.at[jnp.arange(n0, n0 + pad), jnp.arange(n0, n0 + pad)].set(1.0)
    n = a.shape[-1]
    nb = n // block

    out = jnp.zeros_like(a)
    work = a
    for k in range(nb):
        # work is the trailing submatrix from offset k*block on.
        lkk = jnp.linalg.cholesky(work[:block, :block])
        strip = lkk
        if k + 1 < nb:
            # rows below the diagonal block: solve L21 L11^T = A21.
            panel = lax.linalg.triangular_solve(
                lkk, work[block:, :block], left_side=False, lower=True,
                transpose_a=True)
            strip = jnp.concatenate([lkk, panel], axis=0)
            rest = work[block:, block:]
            # Lower-triangular syrk: update block-column c only from its
            # diagonal block down; the stale upper triangle is never read.
            for c in range(rest.shape[0] // block):
                pc = panel[c * block:(c + 1) * block]          # [b, b]
                upd = panel[c * block:] @ pc.T                 # [rest-c*b, b]
                rest = lax.dynamic_update_slice(
                    rest,
                    lax.dynamic_slice(rest, (c * block, c * block),
                                      upd.shape) - upd,
                    (c * block, c * block))
            work = rest
        out = lax.dynamic_update_slice(out, strip, (k * block, k * block))
    return out[:n0, :n0]


def distributed_cholesky(a: jax.Array, mesh: Optional[Mesh] = None,
                         block: int = 512, axis_name: str = "data") -> jax.Array:
    """Row-sharded blocked Cholesky over a device mesh.

    With ``mesh=None`` runs the single-device blocked kernel.
    """
    if mesh is None or mesh.size == 1:
        return blocked_cholesky(a, block=block)
    shard = row_sharding(mesh, ndim=2, axis_name=axis_name)
    fn = jax.jit(partial(blocked_cholesky, block=block),
                 in_shardings=shard, out_shardings=shard)
    return fn(jax.device_put(a, shard))
