"""Architecture builders (TPU-native replacement for experiments/nt_kernels.py).

Each ``get_*_kernel`` mirrors the corresponding reference builder
(``experiments/nt_kernels.py:21-103``) and returns a ``kernel_fn(x1, x2,
get="nngp")`` closure over the (possibly traced) scale hyperparameters, so that
ML-II gradients flow through the full layer recursion exactly as in the
reference (``spax/kernels.py:37-41``).

``get_*_layer`` variants return the composed :class:`snngp.nn.layers.Layer`
(giving access to finite-width init/apply for the ensemble baseline,
reference ``experiments/ensemble/train.py:57-65``).
"""

from __future__ import annotations

from snngp.nn import layers as L

__all__ = [
    "get_act",
    "get_mlp_kernel",
    "get_cnn_kernel",
    "get_conv_resnet_kernel",
    "get_dense_resnet_kernel",
    "get_myrtle_kernel",
    "get_mlp_layer",
    "get_cnn_layer",
    "get_conv_resnet_layer",
    "get_dense_resnet_layer",
    "KERNELS",
]


def get_act(act: str) -> L.Layer:
    if act == "relu":
        return L.Relu()
    if act == "erf":
        return L.Erf()
    raise KeyError(f"Unsupported act '{act}'")


def get_mlp_layer(num_hiddens, num_class=1, act="relu", w_std=1.0, b_std=0.0,
                  last_w_std=1.0, width=512) -> L.Layer:
    """N x [Dense(512) + act] + Dense(num_class)  (nt_kernels.py:21-31)."""
    stack = []
    for _ in range(num_hiddens):
        stack.append(L.Dense(width, w_std=w_std, b_std=b_std))
        stack.append(get_act(act))
    stack.append(L.Dense(num_class, w_std=last_w_std))
    return L.serial(*stack)


def get_cnn_layer(num_hiddens, num_class=1, act="relu", w_std=1.0, b_std=0.0,
                  last_w_std=1.0, channels=1) -> L.Layer:
    """N x [Conv3x3 SAME + act] + Flatten + Dense  (nt_kernels.py:34-45)."""
    stack = []
    for _ in range(num_hiddens):
        stack.append(L.Conv(channels, (3, 3), (1, 1), "SAME", w_std=w_std, b_std=b_std))
        stack.append(get_act(act))
    stack.append(L.Flatten())
    stack.append(L.Dense(num_class, w_std=last_w_std))
    return L.serial(*stack)


def get_conv_resnet_layer(num_hiddens, num_class, act="relu", w_std=1.0,
                          b_std=0.0, last_w_std=1.0, k=1) -> L.Layer:
    """WideResNet NNGP: FanOut/parallel/FanInSum residual blocks, 4 groups with
    stride-2 downsampling (nt_kernels.py:48-80). Channel counts only affect the
    finite-width path (the kernel recursion is width-independent)."""
    act_layer = lambda: get_act(act)

    def block(channels, strides=(1, 1), channel_mismatch=False):
        main = L.serial(
            act_layer(), L.Conv(channels, (3, 3), strides, "SAME", w_std=w_std, b_std=b_std),
            act_layer(), L.Conv(channels, (3, 3), (1, 1), "SAME", w_std=w_std, b_std=b_std),
        )
        shortcut = (L.Identity() if not channel_mismatch
                    else L.Conv(channels, (3, 3), strides, "SAME", w_std=w_std, b_std=b_std))
        return L.serial(L.FanOut(2), L.parallel(main, shortcut), L.FanInSum())

    def group(n, channels, strides=(1, 1)):
        blocks = [block(channels, strides, channel_mismatch=True)]
        for _ in range(n - 1):
            blocks.append(block(channels, (1, 1)))
        return L.serial(*blocks)

    return L.serial(
        L.Conv(16, (3, 3), (1, 1), "SAME", w_std=w_std, b_std=b_std),
        group(num_hiddens, int(8 * k)),
        group(num_hiddens, int(16 * k), (2, 2)),
        group(num_hiddens, int(32 * k), (2, 2)),
        group(num_hiddens, int(64 * k), (2, 2)),
        L.Flatten(),
        L.Dense(num_class, w_std=last_w_std),
    )


def get_dense_resnet_layer(num_hiddens, num_class=1, act="relu", w_std=1.0,
                           b_std=0.0, last_w_std=1.0, width=512) -> L.Layer:
    """Dense residual blocks (nt_kernels.py:83-103)."""

    def res_block():
        return L.serial(
            L.FanOut(2),
            L.parallel(
                L.serial(get_act(act), L.Dense(width, w_std=w_std, b_std=b_std)),
                L.Identity(),
            ),
            L.FanInSum(),
        )

    stack = [L.Dense(width, w_std=w_std, b_std=b_std)]
    stack += [res_block() for _ in range(num_hiddens)]
    stack += [get_act(act), L.Dense(num_class, w_std=last_w_std)]
    return L.serial(*stack)


def _as_kernel_fn(builder):
    def get_kernel(num_hiddens, num_class=1, act="relu", w_std=1.0, b_std=0.0,
                   last_w_std=1.0, **kw):
        layer = builder(num_hiddens, num_class, act, w_std, b_std, last_w_std, **kw)
        return L.kernel_fn_of(layer)

    return get_kernel


def _min_fused_n() -> int:
    """Pallas fused-Gram dispatch threshold: below this the XLA tier wins on
    compile latency; above it the fused kernel wins on HBM traffic. Override
    with SNNGP_PALLAS_MIN_N (set huge to disable dispatch)."""
    import os
    return int(os.environ.get("SNNGP_PALLAS_MIN_N", "256"))


def _fused_backend_ok() -> bool:
    """Fused Pallas dispatch targets TPU. SNNGP_PALLAS_FORCE=1 engages it on
    any backend (pair with the kernels' INTERPRET=True on CPU) — used by the
    fused-tier CLI tests, which would otherwise only ever exercise the XLA
    tier off-TPU."""
    import os

    import jax
    return (jax.default_backend() == "tpu"
            or os.environ.get("SNNGP_PALLAS_FORCE") == "1")


def _use_fused_mlp(x1, x2, get):
    import jax
    return (get == "nngp" and x1.ndim == 2
            and min(x1.shape[0], x2.shape[0]) >= _min_fused_n()
            and _fused_backend_ok())


def get_mlp_kernel(num_hiddens, num_class=1, act="relu", w_std=1.0, b_std=0.0,
                   last_w_std=1.0, width=512, trainable_inputs=True):
    """MLP kernel_fn with TPU auto-dispatch to the Pallas fused Gram kernel
    (snngp/ops/pallas/gram.py) for large nngp blocks; falls back to the
    reference-tier recursion elsewhere (CPU, small N, ntk requests).

    ``trainable_inputs=False`` declares that gradients are only ever taken
    w.r.t. the scale scalars (the ML-II regression configuration,
    regression/train.py:62): the fused kernel's backward then runs the
    forward-mode scalar-tangent Pallas kernel instead of the XLA-tier
    reverse recursion (~3x forward vs materializing every layer in HBM)."""
    ref_fn = _as_kernel_fn(get_mlp_layer)(
        num_hiddens, num_class, act, w_std, b_std, last_w_std, width=width)

    def kernel_fn(x1, x2=None, get="nngp"):
        x2_eff = x1 if x2 is None else x2
        if _use_fused_mlp(x1, x2_eff, get):
            from snngp.ops.pallas.gram import mlp_gram
            return mlp_gram(x1, x2_eff, depth=num_hiddens, act=act,
                            w_std=w_std, b_std=b_std, last_w_std=last_w_std,
                            trainable_inputs=trainable_inputs)
        return ref_fn(x1, x2, get=get)

    return kernel_fn


def get_cnn_kernel(num_hiddens, num_class=1, act="relu", w_std=1.0, b_std=0.0,
                   last_w_std=1.0, channels=1, trainable_inputs=True):
    """CNN kernel_fn with TPU auto-dispatch to the fused Pallas conv-Gram
    kernel (stride-1 SAME 3x3, the reference architecture).
    ``trainable_inputs=False``: scalar-only gradients via the fused tangent
    kernel (see :func:`get_mlp_kernel`); keep True for SVSP classification,
    which trains its inducing inputs."""
    ref_fn = _as_kernel_fn(get_cnn_layer)(
        num_hiddens, num_class, act, w_std, b_std, last_w_std, channels=channels)

    def kernel_fn(x1, x2=None, get="nngp"):
        import jax
        x2_eff = x1 if x2 is None else x2
        # hw <= 1024 bound (CIFAR/SVHN 32x32 included): above 256 the kernel
        # switches to the narrow-tile layout (conv_gram._cnn_gram_pallas) to
        # stay inside Mosaic's scoped-VMEM budget; beyond 1024 the variance
        # blocks outgrow VMEM and the XLA tier takes over.
        if (get == "nngp" and x1.ndim == 4
                and x1.shape[1] * x1.shape[2] <= 1024
                and min(x1.shape[0], x2_eff.shape[0]) >= _min_fused_n()
                and _fused_backend_ok()):
            from snngp.ops.pallas.conv_gram import cnn_gram
            return cnn_gram(x1, x2_eff, depth=num_hiddens, act=act,
                            w_std=w_std, b_std=b_std, last_w_std=last_w_std,
                            trainable_inputs=trainable_inputs)
        return ref_fn(x1, x2, get=get)

    return kernel_fn


def get_conv_resnet_kernel(num_hiddens, num_class=1, act="relu", w_std=1.0,
                           b_std=0.0, last_w_std=1.0, k=1):
    """Conv-WideResNet kernel_fn with TPU auto-dispatch to the fused Pallas
    tail-block kernel (stride-1 residual blocks in VMEM; strided group
    boundaries in XLA) for small-image blocks."""
    ref_fn = _as_kernel_fn(get_conv_resnet_layer)(
        num_hiddens, num_class, act, w_std, b_std, last_w_std, k=k)

    def kernel_fn(x1, x2=None, get="nngp"):
        import jax
        x2_eff = x1 if x2 is None else x2
        if (get == "nngp" and x1.ndim == 4
                and x1.shape[1] * x1.shape[2] <= 1024
                and min(x1.shape[0], x2_eff.shape[0]) >= _min_fused_n()
                and _fused_backend_ok()):
            from snngp.ops.pallas.resnet_conv_gram import conv_resnet_gram
            return conv_resnet_gram(x1, x2_eff, depth=num_hiddens,
                                    num_class=num_class, act=act, w_std=w_std,
                                    b_std=b_std, last_w_std=last_w_std)
        return ref_fn(x1, x2, get=get)

    return kernel_fn


def get_dense_resnet_kernel(num_hiddens, num_class=1, act="relu", w_std=1.0,
                            b_std=0.0, last_w_std=1.0, width=512,
                            trainable_inputs=True):
    """Dense-resnet kernel_fn with TPU auto-dispatch to the fused Pallas
    kernel (resnet mode) for large nngp blocks. ``trainable_inputs=False``:
    scalar-only gradients via the fused tangent kernel (see
    :func:`get_mlp_kernel`)."""
    ref_fn = _as_kernel_fn(get_dense_resnet_layer)(
        num_hiddens, num_class, act, w_std, b_std, last_w_std, width=width)

    def kernel_fn(x1, x2=None, get="nngp"):
        x2_eff = x1 if x2 is None else x2
        if _use_fused_mlp(x1, x2_eff, get):
            from snngp.ops.pallas.gram import resnet_gram
            return resnet_gram(x1, x2_eff, depth=num_hiddens, act=act,
                               w_std=w_std, b_std=b_std, last_w_std=last_w_std,
                               trainable_inputs=trainable_inputs)
        return ref_fn(x1, x2, get=get)

    return kernel_fn

def get_myrtle_kernel(depth=5, num_class=1, act="relu", w_std=1.0, b_std=0.0,
                      last_w_std=1.0, trainable_inputs=True):
    """Myrtle-{5,7,10} kernel_fn (full spatial-covariance tier with 2x2
    average pooling + GAP) with TPU auto-dispatch to the fused Pallas kernel
    (snngp/ops/pallas/myrtle_gram.py; ~20x the XLA tier at 32x32).

    ``trainable_inputs=False``: ML-II scalar-only gradients via the fused
    tangent kernel (see :func:`get_mlp_kernel`); required for
    kernel-hyperparameter training at sizes where the XLA-tier reverse
    recursion would OOM. Compiled fused shapes are 16x16/32x32 (8x8 and
    other shapes use the XLA full tier)."""
    from snngp.nn.full import get_myrtle_kernel as _full_myrtle
    ref_fn = _full_myrtle(depth, num_class, act, w_std=w_std, b_std=b_std,
                          last_w_std=last_w_std)

    def kernel_fn(x1, x2=None, get="nngp"):
        import jax
        x2_eff = x1 if x2 is None else x2
        if (get == "nngp" and x1.ndim == 4 and x1.shape[1] == x1.shape[2]
                and x1.shape[1] in (16, 32)
                and _fused_backend_ok()):
            n1, n2 = x1.shape[0], x2_eff.shape[0]
            hw = x1.shape[1] * x1.shape[2]
            # The XLA full tier materializes the [n1, n2, hw, hw] spatial
            # covariance: 4 MB/pair at 32x32 — above ~2 GB of state it is
            # not a fallback but an OOM, so the fused kernel engages
            # regardless of the small-N compile-latency threshold (e.g. the
            # SVSP inducing/cross blocks at CIFAR scale: [100, 200] pairs).
            full_tier_bytes = 4.0 * n1 * n2 * hw * hw
            if (min(n1, n2) >= _min_fused_n()
                    or full_tier_bytes > 2 * 1024 ** 3):
                from snngp.ops.pallas.myrtle_gram import myrtle_gram
                return myrtle_gram(x1, x2_eff, depth=depth, act=act,
                                   w_std=w_std, b_std=b_std,
                                   last_w_std=last_w_std,
                                   trainable_inputs=trainable_inputs)
        return ref_fn(x1, x2, get=get)

    return kernel_fn


KERNELS = {
    "mlp": get_mlp_kernel,
    "cnn": get_cnn_kernel,
    "resnet-conv": get_conv_resnet_kernel,
    "resnet-dense": get_dense_resnet_kernel,
    "myrtle": get_myrtle_kernel,
}
