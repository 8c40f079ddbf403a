"""Pallas TPU kernels (the framework's native tier)."""

from snngp.ops.pallas.gram import mlp_gram, mlp_var_stack

__all__ = ["mlp_gram", "mlp_var_stack"]
