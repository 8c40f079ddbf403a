"""Pallas TPU kernels (the framework's native tier)."""

from snngp.ops.pallas.gram import mlp_gram, resnet_gram, mlp_var_stack, resnet_var_stack

__all__ = ["mlp_gram", "resnet_gram", "mlp_var_stack", "resnet_var_stack"]
