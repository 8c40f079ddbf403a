"""Pallas TPU kernels (the framework's native tier)."""

from snngp.ops.pallas.gram import mlp_gram, resnet_gram, mlp_var_stack, resnet_var_stack
from snngp.ops.pallas.conv_gram import cnn_gram
from snngp.ops.pallas.resnet_conv_gram import conv_resnet_gram, resnet_tail_blocks

__all__ = ["mlp_gram", "resnet_gram", "mlp_var_stack", "resnet_var_stack",
           "cnn_gram", "conv_resnet_gram", "resnet_tail_blocks"]
