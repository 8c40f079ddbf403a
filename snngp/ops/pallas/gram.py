"""Pallas TPU kernel: fused MLP-NNGP Gram materialization.

The reference materializes one [N, N] buffer per layer through
neural_tangents' layer recursion (``spax/kernels.py:23-27`` +
``nt_kernels.py:21-31``): HBM traffic ~ 2 * depth * N^2 * 4 bytes. This kernel
fuses the entire depth recursion per output tile in VMEM:

- the diagonal (variance) recursion is 1-D and runs outside the kernel
  (O(N * depth), negligible);
- the kernel grid tiles the [N1, N2] output; each program computes the input
  second-moment tile on the MXU (x_rows @ x_cols^T / D) and then applies the
  closed-form Dense/activation recursion elementwise on the VPU using the
  per-layer variance slices — one HBM write per output element.

Differentiable w.r.t. (w_std, b_std, last_w_std) two ways:

- default (``trainable_inputs=True`` entry points): custom VJP whose backward
  recomputes through the reference-tier recursion and lets XLA differentiate
  it — produces x1/x2 cotangents too (the SVSP classification path trains
  its inducing inputs, spax/models.py:16-20), at the cost of materializing
  every layer state in HBM.
- scalar-only (``trainable_inputs=False``): ML-II training
  (regression/train.py:62) differentiates ONLY the three scales, so the
  backward runs a second fused Pallas kernel that forward-propagates the
  three tangents through the recursion in VMEM (the activation partials
  T_k/T_v1/T_v2 are shared across tangents) and contracts them with the
  cotangent — backward ~3x the fused forward instead of the XLA-tier
  reverse. x1/x2 cotangents are zero by contract.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mlp_gram", "resnet_gram", "mlp_var_stack", "resnet_var_stack"]

# Flip to True (tests) to run the kernel through the Pallas interpreter on CPU.
INTERPRET = False


def _acos(c):
    """arccos on [-1, 1] built from sqrt/fma/select only.

    Pallas TPU lowers no inverse-trig primitives (acos/asin/atan2), so we
    implement it: Abramowitz & Stegun 4.4.46 minimax polynomial,
    arccos(x) = sqrt(1-x) * P7(x) on [0, 1] (|err| <= 2e-8, below fp32 eps),
    reflected to [-1, 0) via arccos(x) = pi - arccos(-x).

    Constants are weak-typed Python floats so the computation stays in the
    input dtype (the bf16 Myrtle pair state must not silently upcast).
    """
    a = jnp.abs(c)
    p = -0.0012624911
    for coef in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
                 0.0889789874, -0.2145988016, 1.5707963050):
        p = p * a + coef
    acos_abs = jnp.sqrt(jnp.maximum(1.0 - a, 0.0)) * p
    return jnp.where(c < 0.0, jnp.pi - acos_abs, acos_abs)


def _asin(c):
    return 0.5 * jnp.pi - _acos(c)


_INV_2PI = 0.15915493667125702  # 1/(2 pi), fp32


def _relu_t(k, v1, v2):
    p = jnp.maximum(v1 * v2, 1e-30)
    r = jax.lax.rsqrt(p)
    c = jnp.clip(k * r, -1.0, 1.0)
    theta = _acos(c)
    # sin(theta) = sqrt(1 - c^2) exactly on [0, pi] — avoids a sin() lowering.
    sin_t = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
    # sqrt(p) as p * rsqrt(p): one multiply instead of a (multi-pass) VPU
    # divide for the sin(theta)/r term.
    return (sin_t * (p * r) + (jnp.pi - theta) * k) * _INV_2PI


def _erf_t(k, v1, v2):
    r = jax.lax.rsqrt((1.0 + 2.0 * v1) * (1.0 + 2.0 * v2))
    return (2.0 / jnp.pi) * _asin(jnp.clip(2.0 * k * r, -1.0, 1.0))


_ACT_T = {"relu": _relu_t, "erf": _erf_t}


def _relu_t_partials(k, v1, v2):
    """(T, dT/dk, dT/dv1, dT/dv2) for the arccos kernel, sharing the
    rsqrt/acos work. Same analytic forms as the reference tier's custom JVP
    (snngp/nn/layers.py:_relu_t_jvp): finite at the gram diagonal c = +-1."""
    p = jnp.maximum(v1 * v2, 1e-30)
    r = jax.lax.rsqrt(p)
    c = jnp.clip(k * r, -1.0, 1.0)
    theta = _acos(c)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
    t = (sin_t * (p * r) + (jnp.pi - theta) * k) * _INV_2PI
    t_k = (jnp.pi - theta) * _INV_2PI
    # dT/dv1 = sin(theta) v2 / (4 pi sqrt(p));  1/sqrt(p) = r.
    t_v1 = sin_t * v2 * r * (0.5 * _INV_2PI)
    t_v2 = sin_t * v1 * r * (0.5 * _INV_2PI)
    return t, t_k, t_v1, t_v2


def _erf_t_partials(k, v1, v2):
    """(T, dT/dk, dT/dv1, dT/dv2) for the arcsin kernel. Matches XLA AD
    through the reference tier (snngp/nn/layers.py:_erf_t): clip zeroes the
    gradient outside |2k/denom| < 1."""
    d1 = 1.0 + 2.0 * v1
    d2 = 1.0 + 2.0 * v2
    r = jax.lax.rsqrt(d1 * d2)            # 1 / denom
    g = 2.0 * k * r
    c = jnp.clip(g, -1.0, 1.0)
    t = (2.0 / jnp.pi) * _asin(c)
    inside = (g > -1.0) & (g < 1.0)
    base = jnp.where(
        inside,
        (2.0 / jnp.pi) * jax.lax.rsqrt(jnp.maximum(1.0 - c * c, 1e-30)),
        0.0)
    t_k = base * (2.0 * r)
    t_v1 = -base * g / d1
    t_v2 = -base * g / d2
    return t, t_k, t_v1, t_v2


_ACT_T_PARTIALS = {"relu": _relu_t_partials, "erf": _erf_t_partials}


def mlp_var_stack(x: jax.Array, depth: int, act: str, w_std, b_std,
                  feature_dim=None) -> jax.Array:
    """Pre-activation variance vectors per hidden layer: [depth + 1, N].

    Row 0 is the input second moment |x|^2 / D; row l (1-indexed) is the
    variance after the l-th Dense, i.e. the v entering the l-th activation.
    ``feature_dim`` overrides the normalizer when ``x`` is zero-padded along
    features (padding must not change D).
    """
    w2 = w_std * w_std
    b2 = b_std * b_std
    v = jnp.sum(x * x, axis=-1) / (feature_dim or x.shape[-1])
    out = [v]
    for _ in range(depth):
        v = w2 * v + b2              # Dense
        out.append(v)
        if act == "relu":
            v = v / 2.0              # post-activation variance
        else:
            v = (2.0 / jnp.pi) * jnp.arcsin(jnp.clip(2.0 * v / (1.0 + 2.0 * v),
                                                     -1.0, 1.0))
    return jnp.stack(out)


def resnet_var_stack(x: jax.Array, depth: int, act: str, w_std, b_std,
                     feature_dim=None) -> jax.Array:
    """Pre-activation variances for the dense-resnet recursion: row l is the
    variance entering block l's activation (l < depth) / the final activation
    (l == depth)."""
    w2 = w_std * w_std
    b2 = b_std * b_std
    v = jnp.sum(x * x, axis=-1) / (feature_dim or x.shape[-1])
    v = w2 * v + b2                       # initial Dense
    out = [v]
    for _ in range(depth):
        if act == "relu":
            tv = v / 2.0
        else:
            tv = (2.0 / jnp.pi) * jnp.arcsin(jnp.clip(2.0 * v / (1.0 + 2.0 * v),
                                                      -1.0, 1.0))
        v = v + w2 * tv + b2              # residual block
        out.append(v)
    return jnp.stack(out)


def _gram_kernel(scale_ref, x1_ref, x2_ref, v1_ref, v2_ref, out_ref, *,
                 depth: int, act: str, mode: str):
    """One (TM, TN) output tile: MXU input moment + fused depth recursion.

    mode="mlp":    k <- T(w^2 k + b^2) per layer, final k <- last^2 k
                   (nt_kernels.py:21-31).
    mode="resnet": k <- w^2 k0 + b^2 once, then k <- k + w^2 T(k) + b^2 per
                   residual block, final k <- last^2 T(k)
                   (nt_kernels.py:83-103: Dense -> [FanOut(act->Dense), Id,
                   FanInSum] x depth -> act -> Dense).
    """
    w2 = scale_ref[0]
    b2 = scale_ref[1]
    last2 = scale_ref[2]
    inv_d = scale_ref[3]

    t_fn = _ACT_T[act]
    k = jnp.dot(x1_ref[:], x2_ref[:].T, preferred_element_type=jnp.float32) * inv_d

    if mode == "mlp":
        for layer in range(depth):
            k = w2 * k + b2                               # Dense(width)
            v1 = v1_ref[layer + 1, :]
            v2 = v2_ref[layer + 1, :]
            k = t_fn(k, v1[:, None], v2[None, :])         # dual activation
        out_ref[:] = last2 * k                            # final Dense
    else:
        k = w2 * k + b2                                   # initial Dense
        for layer in range(depth):
            v1 = v1_ref[layer, :]
            v2 = v2_ref[layer, :]
            k = k + w2 * t_fn(k, v1[:, None], v2[None, :]) + b2   # res block
        v1 = v1_ref[depth, :]
        v2 = v2_ref[depth, :]
        out_ref[:] = last2 * t_fn(k, v1[:, None], v2[None, :])    # act+Dense


def _mlp_gram_pallas(x1, x2, v1s, v2s, scales, *, depth, act, tile,
                     mode="mlp"):
    n1, d = x1.shape
    n2 = x2.shape[0]
    v1s_rows = v1s.shape[0]
    tm, tn = tile
    grid = (n1 // tm, n2 // tn)
    kernel = functools.partial(_gram_kernel, depth=depth, act=act, mode=mode)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n1, n2), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm, d), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((tn, d), lambda i, j, *_: (j, 0)),
                pl.BlockSpec((v1s_rows, tm), lambda i, j, *_: (0, i)),
                pl.BlockSpec((v1s_rows, tn), lambda i, j, *_: (0, j)),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, *_: (i, j)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n1 * n2 * d + 10 * depth * n1 * n2,
            bytes_accessed=(n1 * d + n2 * d + n1 * n2) * 4,
            transcendentals=2 * depth * n1 * n2,
        ),
        interpret=INTERPRET,
    )(scales, x1, x2, v1s, v2s)


def _gram_grad_kernel(scale_ref, x1_ref, x2_ref, v1_ref, v2_ref, dv1_ref,
                      dv2_ref, out_ref, dw_ref, db_ref, dl_ref, *,
                      depth: int, act: str, mode: str):
    """Augmented tile: primal + forward-mode tangents w.r.t. the three scale
    scalars, fused in VMEM. The activation partials (T_k, T_v1, T_v2) are
    computed once per layer and shared by all tangents, so the whole
    augmented recursion costs ~3x the forward instead of an XLA-tier reverse
    pass that materializes every layer state in HBM."""
    w2, b2, last2, inv_d = (scale_ref[0], scale_ref[1], scale_ref[2],
                            scale_ref[3])
    w, b, last = scale_ref[4], scale_ref[5], scale_ref[6]

    partials = _ACT_T_PARTIALS[act]
    k = jnp.dot(x1_ref[:], x2_ref[:].T,
                preferred_element_type=jnp.float32) * inv_d

    def vrow(ref, i):
        return ref[i, :][:, None]

    def vcol(ref, i):
        return ref[i, :][None, :]

    if mode == "mlp":
        dkw = jnp.zeros_like(k)
        dkb = jnp.zeros_like(k)
        for layer in range(depth):
            u = w2 * k + b2                               # Dense
            duw = w2 * dkw + (2.0 * w) * k
            dub = w2 * dkb + 2.0 * b
            t, tk, tv1, tv2 = partials(u, vrow(v1_ref, layer + 1),
                                       vcol(v2_ref, layer + 1))
            dkw = (tk * duw + tv1 * vrow(dv1_ref[0], layer + 1)
                   + tv2 * vcol(dv2_ref[0], layer + 1))
            dkb = (tk * dub + tv1 * vrow(dv1_ref[1], layer + 1)
                   + tv2 * vcol(dv2_ref[1], layer + 1))
            k = t
        out_ref[:] = last2 * k
        dw_ref[:] = last2 * dkw
        db_ref[:] = last2 * dkb
        dl_ref[:] = (2.0 * last) * k
    else:
        k0 = k
        k = w2 * k0 + b2                                  # initial Dense
        dkw = (2.0 * w) * k0
        dkb = jnp.zeros_like(k0) + 2.0 * b
        for layer in range(depth):
            t, tk, tv1, tv2 = partials(k, vrow(v1_ref, layer),
                                       vcol(v2_ref, layer))
            dtw = (tk * dkw + tv1 * vrow(dv1_ref[0], layer)
                   + tv2 * vcol(dv2_ref[0], layer))
            dtb = (tk * dkb + tv1 * vrow(dv1_ref[1], layer)
                   + tv2 * vcol(dv2_ref[1], layer))
            k = k + w2 * t + b2                           # residual block
            dkw = dkw + w2 * dtw + (2.0 * w) * t
            dkb = dkb + w2 * dtb + 2.0 * b
        t, tk, tv1, tv2 = partials(k, vrow(v1_ref, depth),
                                   vcol(v2_ref, depth))
        out_ref[:] = last2 * t
        dw_ref[:] = last2 * (tk * dkw + tv1 * vrow(dv1_ref[0], depth)
                             + tv2 * vcol(dv2_ref[0], depth))
        db_ref[:] = last2 * (tk * dkb + tv1 * vrow(dv1_ref[1], depth)
                             + tv2 * vcol(dv2_ref[1], depth))
        dl_ref[:] = (2.0 * last) * t


def _var_stack_with_tangents(stack_fn, x, depth, act, w_std, b_std,
                             feature_dim, rows):
    """(v, dv/dw_std, dv/db_std) for a variance stack, layer axis padded to
    ``rows``; tangents via forward-mode AD of the O(N depth) stack recursion
    (negligible next to the N^2 kernel)."""
    v, dv_w = jax.jvp(
        lambda ww: stack_fn(x, depth, act, ww, b_std, feature_dim=feature_dim),
        (w_std,), (jnp.ones_like(w_std),))
    _, dv_b = jax.jvp(
        lambda bb: stack_fn(x, depth, act, w_std, bb, feature_dim=feature_dim),
        (b_std,), (jnp.ones_like(b_std),))
    pad = ((0, rows - v.shape[0]), (0, 0))
    return (jnp.pad(v, pad),
            jnp.stack([jnp.pad(dv_w, pad), jnp.pad(dv_b, pad)]))


def _mlp_gram_grads(depth, act, tile, mode, x1, x2, w_std, b_std, last_w_std):
    """Fused primal + the three scalar tangent Grams (dK/dw, dK/db, dK/dl)."""
    tm, tn = tile
    n1, n2 = x1.shape[0], x2.shape[0]
    p1 = (-n1) % tm
    p2 = (-n2) % tn
    pd = (-x1.shape[-1]) % 128
    x1p = jnp.pad(x1.astype(jnp.float32), ((0, p1), (0, pd)))
    x2p = jnp.pad(x2.astype(jnp.float32), ((0, p2), (0, pd)))

    rows = max(8, -(-(depth + 1) // 8) * 8)
    stack_fn = resnet_var_stack if mode == "resnet" else mlp_var_stack
    w_std = jnp.asarray(w_std, jnp.float32)
    b_std = jnp.asarray(b_std, jnp.float32)
    last_w_std = jnp.asarray(last_w_std, jnp.float32)
    v1s, dv1s = _var_stack_with_tangents(stack_fn, x1p, depth, act, w_std,
                                         b_std, x1.shape[-1], rows)
    v2s, dv2s = _var_stack_with_tangents(stack_fn, x2p, depth, act, w_std,
                                         b_std, x1.shape[-1], rows)

    scales = jnp.stack([w_std ** 2, b_std ** 2, last_w_std ** 2,
                        jnp.asarray(1.0 / x1.shape[-1], jnp.float32),
                        w_std, b_std, last_w_std, jnp.float32(0.0)])

    m1, m2 = n1 + p1, n2 + p2
    grid = (m1 // tm, m2 // tn)
    kernel = functools.partial(_gram_grad_kernel, depth=depth, act=act,
                               mode=mode)
    shp = jax.ShapeDtypeStruct((m1, m2), jnp.float32)
    spec = pl.BlockSpec((tm, tn), lambda i, j, *_: (i, j))
    outs = pl.pallas_call(
        kernel,
        out_shape=(shp, shp, shp, shp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm, x1p.shape[-1]), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((tn, x1p.shape[-1]), lambda i, j, *_: (j, 0)),
                pl.BlockSpec((rows, tm), lambda i, j, *_: (0, i)),
                pl.BlockSpec((rows, tn), lambda i, j, *_: (0, j)),
                pl.BlockSpec((2, rows, tm), lambda i, j, *_: (0, 0, i)),
                pl.BlockSpec((2, rows, tn), lambda i, j, *_: (0, 0, j)),
            ],
            out_specs=(spec, spec, spec, spec),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m1 * m2 * x1p.shape[-1] + 40 * depth * m1 * m2,
            bytes_accessed=(m1 * x1p.shape[-1] + m2 * x1p.shape[-1]
                            + 4 * m1 * m2) * 4,
            transcendentals=2 * depth * m1 * m2,
        ),
        interpret=INTERPRET,
    )(scales, x1p, x2p, v1s, v2s, dv1s, dv2s)
    return tuple(o[:n1, :n2] for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _mlp_gram_scalar(depth, act, tile, mode, x1, x2, w_std, b_std, last_w_std):
    """Fused Gram whose backward differentiates ONLY the three scale scalars
    (ML-II contract: x1/x2 are data, their cotangents are zero)."""
    return _mlp_gram(depth, act, tile, mode, x1, x2, w_std, b_std, last_w_std)


def _mlp_gram_scalar_fwd(depth, act, tile, mode, x1, x2, w_std, b_std,
                         last_w_std):
    out = _mlp_gram(depth, act, tile, mode, x1, x2, w_std, b_std, last_w_std)
    return out, (x1, x2, w_std, b_std, last_w_std)


def _mlp_gram_scalar_bwd(depth, act, tile, mode, res, g):
    x1, x2, w_std, b_std, last_w_std = res
    _, dkw, dkb, dkl = _mlp_gram_grads(depth, act, tile, mode, x1, x2,
                                       w_std, b_std, last_w_std)
    gw = jnp.sum(g * dkw)
    gb = jnp.sum(g * dkb)
    gl = jnp.sum(g * dkl)
    return (jnp.zeros_like(x1), jnp.zeros_like(x2),
            jnp.asarray(gw, jnp.asarray(w_std).dtype),
            jnp.asarray(gb, jnp.asarray(b_std).dtype),
            jnp.asarray(gl, jnp.asarray(last_w_std).dtype))


_mlp_gram_scalar.defvjp(_mlp_gram_scalar_fwd, _mlp_gram_scalar_bwd)


def _reference_recursion(x1, x2, depth, act, w_std, b_std, last_w_std,
                         mode="mlp"):
    """Plain-jnp recursion with identical math (backward surrogate/goldens)."""
    from snngp.nn import arch
    builder = (arch.get_dense_resnet_layer if mode == "resnet"
               else arch.get_mlp_layer)
    from snngp.nn.layers import kernel_fn_of
    kfn = kernel_fn_of(builder(depth, 1, act, w_std, b_std, last_w_std))
    return kfn(x1, x2, get="nngp")


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _mlp_gram(depth, act, tile, mode, x1, x2, w_std, b_std, last_w_std):
    tm, tn = tile
    n1, n2 = x1.shape[0], x2.shape[0]
    # Pad rows/cols to tile multiples and features to the 128 lane width
    # (zero features add zero moments; padded rows are sliced off).
    p1 = (-n1) % tm
    p2 = (-n2) % tn
    pd = (-x1.shape[-1]) % 128
    x1p = jnp.pad(x1.astype(jnp.float32), ((0, p1), (0, pd)))
    x2p = jnp.pad(x2.astype(jnp.float32), ((0, p2), (0, pd)))

    # Pad the layer axis to the fp32 sublane minimum (8) — sub-minimal blocks
    # mis-tile on TPU.
    rows = max(8, -(-(depth + 1) // 8) * 8)
    stack_fn = resnet_var_stack if mode == "resnet" else mlp_var_stack
    v1s = stack_fn(x1p, depth, act, w_std, b_std, feature_dim=x1.shape[-1])
    v2s = stack_fn(x2p, depth, act, w_std, b_std, feature_dim=x1.shape[-1])
    v1s = jnp.pad(v1s, ((0, rows - depth - 1), (0, 0)))
    v2s = jnp.pad(v2s, ((0, rows - depth - 1), (0, 0)))

    scales = jnp.stack([
        jnp.asarray(w_std, jnp.float32) ** 2,
        jnp.asarray(b_std, jnp.float32) ** 2,
        jnp.asarray(last_w_std, jnp.float32) ** 2,
        jnp.asarray(1.0 / x1.shape[-1], jnp.float32),
    ])
    out = _mlp_gram_pallas(x1p, x2p, v1s, v2s, scales, depth=depth, act=act,
                           tile=tile, mode=mode)
    return out[:n1, :n2]


def _mlp_gram_fwd(depth, act, tile, mode, x1, x2, w_std, b_std, last_w_std):
    out = _mlp_gram(depth, act, tile, mode, x1, x2, w_std, b_std, last_w_std)
    return out, (x1, x2, w_std, b_std, last_w_std)


def _mlp_gram_bwd(depth, act, tile, mode, res, g):
    x1, x2, w_std, b_std, last_w_std = res
    _, vjp = jax.vjp(
        lambda a, b, w, bs, l: _reference_recursion(a, b, depth, act, w, bs, l,
                                                    mode=mode),
        x1, x2, w_std, b_std, last_w_std)
    return vjp(g)


_mlp_gram.defvjp(_mlp_gram_fwd, _mlp_gram_bwd)


def mlp_gram(x1: jax.Array, x2: jax.Array, *, depth: int, act: str = "relu",
             w_std, b_std, last_w_std, tile: Tuple[int, int] = (256, 256),
             trainable_inputs: bool = True) -> jax.Array:
    """Fused MLP-NNGP Gram — drop-in for
    ``arch.get_mlp_kernel(depth, act=act, ...)(x1, x2, get="nngp")``.

    ``trainable_inputs=False`` switches the backward to the fused
    forward-mode scalar-tangent kernel (~3x forward; x1/x2 cotangents are
    zero by contract) — the ML-II training configuration
    (regression/train.py:62 trains only the scale scalars)."""
    if act not in _ACT_T:
        raise KeyError(f"unsupported act '{act}'")
    fn = _mlp_gram if trainable_inputs else _mlp_gram_scalar
    return fn(depth, act, tuple(tile), "mlp", x1, x2,
              jnp.asarray(w_std, jnp.float32),
              jnp.asarray(b_std, jnp.float32),
              jnp.asarray(last_w_std, jnp.float32))


def resnet_gram(x1: jax.Array, x2: jax.Array, *, depth: int, act: str = "relu",
                w_std, b_std, last_w_std, tile: Tuple[int, int] = (256, 256),
                trainable_inputs: bool = True) -> jax.Array:
    """Fused dense-resnet NNGP Gram — drop-in for
    ``arch.get_dense_resnet_kernel(depth, ...)(x1, x2, get="nngp")``.
    ``trainable_inputs=False``: see :func:`mlp_gram`."""
    if act not in _ACT_T:
        raise KeyError(f"unsupported act '{act}'")
    fn = _mlp_gram if trainable_inputs else _mlp_gram_scalar
    return fn(depth, act, tuple(tile), "resnet", x1, x2,
              jnp.asarray(w_std, jnp.float32),
              jnp.asarray(b_std, jnp.float32),
              jnp.asarray(last_w_std, jnp.float32))
