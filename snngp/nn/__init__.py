"""NNGP/NTK kernel engine: layer IR, combinators, architecture builders."""

from snngp.nn.state import KernelState, input_state
from snngp.nn import layers
from snngp.nn import arch
from snngp.nn.layers import (
    Layer, Dense, Conv, Relu, Erf, Flatten, Identity, FanOut, FanInSum,
    serial, parallel, kernel_fn_of,
)
from snngp.nn.arch import (
    get_mlp_kernel, get_cnn_kernel, get_conv_resnet_kernel, get_dense_resnet_kernel,
    get_mlp_layer, get_cnn_layer, get_conv_resnet_layer, get_dense_resnet_layer,
)

__all__ = [
    "KernelState", "input_state", "layers", "arch",
    "Layer", "Dense", "Conv", "Relu", "Erf", "Flatten", "Identity",
    "FanOut", "FanInSum", "serial", "parallel", "kernel_fn_of",
    "get_mlp_kernel", "get_cnn_kernel", "get_conv_resnet_kernel",
    "get_dense_resnet_kernel", "get_mlp_layer", "get_cnn_layer",
    "get_conv_resnet_layer", "get_dense_resnet_layer",
]
