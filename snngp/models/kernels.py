"""Trainable NNGP kernel wrapper (rebuilds ``spax/kernels.py``).

Holds softplus-constrained scale hyperparameters (w_std, b_std, last_w_std)
and regenerates the compiled kernel recursion from their current values inside
every jitted step, so ML-II gradients flow through the full layer recursion
(``spax/kernels.py:37-41``).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax

from snngp.models import params as P
from snngp.models.bijectors import positive
from snngp.ops import gp_predict

__all__ = ["NNGPKernel"]


class NNGPKernel:
    """Static config; parameters threaded functionally.

    ``get_kernel_fn_builder(w_std, b_std, last_w_std) -> kernel_fn`` mirrors the
    reference's builder closures (``experiments/regression/train.py:119-124``).
    """

    def __init__(self, get_kernel_fn: Callable, w_std: float = 1.0,
                 b_std: float = 1.0, last_w_std: float = 1.0):
        self._get_kernel_fn = get_kernel_fn
        self._init_values = dict(w_std=w_std, b_std=b_std, last_w_std=last_w_std)
        self.bij = positive()

    def init_params(self) -> Dict[str, jax.Array]:
        return {k: P.constrained_init(v, self.bij) for k, v in self._init_values.items()}

    def get_params(self, params):
        """(w_std, b_std, last_w_std) safe values (spax/kernels.py:34-35)."""
        return (
            P.constrained_read(params["w_std"], self.bij),
            P.constrained_read(params["b_std"], self.bij),
            P.constrained_read(params["last_w_std"], self.bij),
        )

    def get_kernel_fn(self, params):
        w_std, b_std, last_w_std = self.get_params(params)
        return self._get_kernel_fn(w_std, b_std, last_w_std)

    def K(self, kernel_fn, x, x2=None):
        """N1 x N2 NNGP Gram block (spax/kernels.py:23-27)."""
        if x2 is None:
            return kernel_fn(x, x, get="nngp")
        return kernel_fn(x, x2, get="nngp")

    def predict(self, kernel_fn, x, y, x_test, eps=1e-6, chol_fn=None):
        """Exact GP posterior (spax/kernels.py:29-32); nt-relative diag_reg.

        ``chol_fn`` swaps in a distributed blocked factorization of the train
        Gram (snngp.parallel.cholesky) for mesh-scale N.
        """
        return gp_predict(kernel_fn, x, y, x_test, diag_reg=eps,
                          compute_cov=True, chol_fn=chol_fn)
