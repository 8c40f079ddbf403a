"""Pallas TPU kernel: fused conv-WideResNet NNGP Gram (matched-pixel tier).

The WideResNet kernel recursion (``experiments/nt_kernels.py:48-80``)
alternates stride-1 residual blocks with stride-2 group boundaries. Strided
stencils change the lane extent mid-kernel, so the decomposition is:

- XLA: the initial conv, each group's *first* (channel-mismatch / strided)
  block, and the Flatten + Dense readout — cheap, one materialization per
  group;
- Pallas (this kernel): each group's stride-1 *tail* blocks, fused per
  (T1, T2) tile in VMEM. Per block:

      t1 = T(k, v_in);  c1 = w^2 S(t1) + b^2
      t2 = T(c1, v_mid); c2 = w^2 S(t2) + b^2
      k <- k + c2                       (Identity-shortcut FanInSum)

  with S the separable 3x3 SAME stencil and the per-stage variance maps
  prefetched (two rows per block, computed outside with the cheap 1-D
  recursion).

Same scoped-VMEM budget discipline as conv_gram.py (~1.5 MB k block);
dispatched only for h*w <= 256. Differentiable via custom VJP through the
reference-tier recursion.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snngp.ops.pallas.gram import _ACT_T
from snngp.ops.pallas.conv_gram import _auto_tile

__all__ = ["resnet_tail_blocks", "strided_mismatch_block", "conv_resnet_gram"]

INTERPRET = False


def _stride2_offsets(h: int, w: int):
    """Lattice offsets (oh, ow) such that SAME stride-2 3x3 conv output (i, j)
    equals the SAME stride-1 conv output at (2i + oh, 2j + ow).

    lax SAME: out[i] = sum_d in[2i - pad_lo + d]; for even extent pad_lo = 0
    (window centered at 2i + 1), for odd extent pad_lo = 1 (centered at 2i).
    """
    return (1 if h % 2 == 0 else 0), (1 if w % 2 == 0 else 0)


def _strided_kernel(scale_ref, k0_ref, v1_ref, v2_ref, out_ref, *,
                    act: str, h: int, w: int):
    """Channel-mismatch stride-2 residual block, fused at full resolution:

        t1 = T(k, v_in);   c1 = w^2 S(t1) + b^2      (== stride-2 conv at the
                                                       (oh, ow) parity lattice)
        t2 = T_lattice(c1, v_mid)                     (v_mid expanded to the
                                                       lattice, ones elsewhere)
        c2 = w^2 S2(t2) + b^2                         (dilated +-2 stencil ==
                                                       reduced-res stride-1 conv
                                                       evaluated on the lattice)
        sc = w^2 S(k) + b^2                           (conv shortcut, stride-2
                                                       at the lattice)
        out = c2 + sc          — valid on the lattice; garbage elsewhere,
                                 subsampled away by the XLA wrapper.

    Off-lattice lanes never contaminate lattice lanes: every shift used after
    the lattice activation is by +-2 (parity-preserving) and the boundary
    masks only admit lattice-interior neighbors.
    """
    w2 = scale_ref[0]
    b2 = scale_ref[1]

    t_fn = _ACT_T[act]
    hw = h * w
    hw_pad = k0_ref.shape[-1]
    k = k0_ref[:]

    oh, ow = _stride2_offsets(h, w)
    h2, w2r = -(-h // 2), -(-w // 2)

    p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, hw_pad), 2)
    col = p % w
    row = p // w
    in_img = p < hw
    col_lo = (col >= 1) & in_img
    col_hi = (col < w - 1) & in_img
    row_lo = (row >= 1) & in_img
    row_hi = (row < h - 1) & in_img
    # Dilated-stencil masks: neighbor (i -+ 1, j -+ 1) of lattice point
    # (2i + oh, 2j + ow) must stay inside the reduced image.
    col_lo2 = (col >= ow + 2) & in_img
    col_hi2 = (col <= ow + 2 * (w2r - 1) - 2) & in_img
    row_lo2 = (row >= oh + 2) & in_img
    row_hi2 = (row <= oh + 2 * (h2 - 1) - 2) & in_img

    def stencil(z):
        zc = (z
              + jnp.where(col_lo, pltpu.roll(z, shift=1, axis=2), 0.0)
              + jnp.where(col_hi, pltpu.roll(z, shift=hw_pad - 1, axis=2), 0.0))
        zr = (zc
              + jnp.where(row_lo, pltpu.roll(zc, shift=w, axis=2), 0.0)
              + jnp.where(row_hi, pltpu.roll(zc, shift=hw_pad - w, axis=2), 0.0))
        return zr / 9.0

    def stencil2(z):
        zc = (z
              + jnp.where(col_lo2, pltpu.roll(z, shift=2, axis=2), 0.0)
              + jnp.where(col_hi2, pltpu.roll(z, shift=hw_pad - 2, axis=2), 0.0))
        zr = (zc
              + jnp.where(row_lo2, pltpu.roll(zc, shift=2 * w, axis=2), 0.0)
              + jnp.where(row_hi2, pltpu.roll(zc, shift=hw_pad - 2 * w, axis=2), 0.0))
        return zr / 9.0

    v_in1 = v1_ref[0, :, :]
    v_in2 = v2_ref[0, :, :]
    t1v = t_fn(k, v_in1[:, None, :], v_in2[None, :, :])
    c1 = w2 * stencil(t1v) + b2
    v_mid1 = v1_ref[1, :, :]
    v_mid2 = v2_ref[1, :, :]
    t2v = t_fn(c1, v_mid1[:, None, :], v_mid2[None, :, :])
    c2 = w2 * stencil2(t2v) + b2
    sc = w2 * stencil(k) + b2
    out_ref[:] = c2 + sc


def _tail_kernel(scale_ref, k0_ref, v1_ref, v2_ref, out_ref, *,
                 nblocks: int, act: str, h: int, w: int,
                 mismatch: bool = False):
    w2 = scale_ref[0]
    b2 = scale_ref[1]

    t_fn = _ACT_T[act]
    hw = h * w
    hw_pad = k0_ref.shape[-1]
    k = k0_ref[:]                           # [T1, T2, HW_pad]

    p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, hw_pad), 2)
    col = p % w
    row = p // w
    in_img = p < hw
    col_lo = (col >= 1) & in_img
    col_hi = (col < w - 1) & in_img
    row_lo = (row >= 1) & in_img
    row_hi = (row < h - 1) & in_img

    def stencil(z):
        zc = (z
              + jnp.where(col_lo, pltpu.roll(z, shift=1, axis=2), 0.0)
              + jnp.where(col_hi, pltpu.roll(z, shift=hw_pad - 1, axis=2), 0.0))
        zr = (zc
              + jnp.where(row_lo, pltpu.roll(zc, shift=w, axis=2), 0.0)
              + jnp.where(row_hi, pltpu.roll(zc, shift=hw_pad - w, axis=2), 0.0))
        return zr / 9.0

    for blk in range(nblocks):
        v_in1 = v1_ref[2 * blk, :, :]
        v_in2 = v2_ref[2 * blk, :, :]
        t1v = t_fn(k, v_in1[:, None, :], v_in2[None, :, :])
        c1 = w2 * stencil(t1v) + b2
        v_mid1 = v1_ref[2 * blk + 1, :, :]
        v_mid2 = v2_ref[2 * blk + 1, :, :]
        t2v = t_fn(c1, v_mid1[:, None, :], v_mid2[None, :, :])
        if mismatch and blk == 0:
            # Channel-mismatch block: conv shortcut instead of identity.
            k = (w2 * stencil(t2v) + b2) + (w2 * stencil(k) + b2)
        else:
            k = k + w2 * stencil(t2v) + b2
    out_ref[:] = k


def _tail_pallas(k0, v1s, v2s, scales, *, nblocks, act, h, w, tile,
                 mismatch=False):
    n1, n2, hwp = k0.shape
    rows = v1s.shape[0]
    t1, t2 = tile
    grid = (n1 // t1, n2 // t2)
    kernel = functools.partial(_tail_kernel, nblocks=nblocks, act=act, h=h, w=w,
                               mismatch=mismatch)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n1, n2, hwp), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((t1, t2, hwp), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((rows, t1, hwp), lambda i, j, *_: (0, i, 0)),
                pl.BlockSpec((rows, t2, hwp), lambda i, j, *_: (0, j, 0)),
            ],
            out_specs=pl.BlockSpec((t1, t2, hwp), lambda i, j, *_: (i, j, 0)),
        ),
        interpret=INTERPRET,
    )(scales, k0, v1s, v2s)


def _tail_var_stack(v, nblocks, act, w_std, b_std, mismatch=False):
    """Variance maps entering each activation of the tail blocks.

    v: [N, H, W] variance entering the first tail block. Returns
    ([2 * nblocks, N, H, W] pre-activation maps, final variance)."""
    from snngp.nn.layers import _patch_mean, _relu_t, _erf_t
    t_fn = {"relu": _relu_t, "erf": _erf_t}[act]
    w2, b2 = w_std * w_std, b_std * b_std
    rows = []
    for blk in range(nblocks):
        rows.append(v)                                  # enters act 1
        c1 = w2 * _patch_mean(t_fn(v, v, v), (3, 3), (1, 1)) + b2
        rows.append(c1)                                 # enters act 2
        main = w2 * _patch_mean(t_fn(c1, c1, c1), (3, 3), (1, 1)) + b2
        if mismatch and blk == 0:
            v = main + (w2 * _patch_mean(v, (3, 3), (1, 1)) + b2)  # conv shortcut
        else:
            v = v + main
    return jnp.stack(rows), v


def resnet_tail_blocks(k, v1, v2, *, nblocks: int, act: str, w_std, b_std,
                       tile: Tuple[int, int] = None, mismatch: bool = False):
    """Run ``nblocks`` stride-1 residual blocks fused.

    k:  [N1, N2, H, W] matched-pixel covariance entering the tail.
    v1: [N1, H, W], v2: [N2, H, W] variances entering the tail.
    With ``mismatch`` the first block uses a stride-1 conv shortcut (the
    channel-mismatch leading block of a non-downsampling group).
    Returns (k', v1', v2') after the blocks.
    """
    n1, n2, h, w = k.shape
    hw = h * w
    if tile is None:
        tile = _auto_tile(hw, 2 * nblocks)
    t1, t2 = tile
    p1 = (-n1) % t1
    p2 = (-n2) % t2
    lane_pad = (-hw) % 128

    v1s, v1_out = _tail_var_stack(v1, nblocks, act, w_std, b_std, mismatch)
    v2s, v2_out = _tail_var_stack(v2, nblocks, act, w_std, b_std, mismatch)

    k0 = jnp.pad(k.reshape(n1, n2, hw), ((0, p1), (0, p2), (0, lane_pad)))
    v1p = jnp.pad(v1s.reshape(2 * nblocks, n1, hw),
                  ((0, 0), (0, p1), (0, lane_pad)))
    v2p = jnp.pad(v2s.reshape(2 * nblocks, n2, hw),
                  ((0, 0), (0, p2), (0, lane_pad)))
    scales = jnp.stack([jnp.asarray(w_std, jnp.float32) ** 2,
                        jnp.asarray(b_std, jnp.float32) ** 2])
    out = _tail_pallas(k0, v1p, v2p, scales, nblocks=nblocks, act=act,
                       h=h, w=w, tile=tile, mismatch=mismatch)
    return (out[:n1, :n2, :hw].reshape(n1, n2, h, w), v1_out, v2_out)


def _strided_var_pieces(v, act, w_std, b_std):
    """Variance recursion through the stride-2 mismatch block (cheap 1-D).

    v: [N, H, W] entering the block. Returns (v_mid [N, H2, W2] entering the
    second activation, v_out [N, H2, W2] leaving the block)."""
    from snngp.nn.layers import _patch_mean, _relu_t, _erf_t
    t_fn = {"relu": _relu_t, "erf": _erf_t}[act]
    w2, b2 = w_std * w_std, b_std * b_std
    c1 = w2 * _patch_mean(t_fn(v, v, v), (3, 3), (2, 2)) + b2
    main = w2 * _patch_mean(t_fn(c1, c1, c1), (3, 3), (1, 1)) + b2
    sc = w2 * _patch_mean(v, (3, 3), (2, 2)) + b2
    return c1, main + sc


def _expand_lattice(v_red, h, w, oh, ow):
    """Place reduced-res values on the (oh, ow) stride-2 lattice of the full
    grid; ones elsewhere (keeps off-lattice activation args finite)."""
    n = v_red.shape[0]
    full = jnp.ones((n, h, w), v_red.dtype)
    return full.at[:, oh::2, ow::2].set(v_red)


def strided_mismatch_block(k, v1, v2, *, act: str, w_std, b_std,
                           tile: Tuple[int, int] = None):
    """Fused stride-2 channel-mismatch residual block (each WRN group's first
    block, ``experiments/nt_kernels.py:62-66`` with strides (2, 2)).

    k: [N1, N2, H, W]; v1/v2: [N, H, W]. Returns reduced (k', v1', v2') at
    [H2, W2] = ceil spatial halves. The kernel runs at full resolution (a
    stride-2 SAME conv is the stride-1 conv subsampled on a parity lattice);
    the single XLA pass afterwards subsamples the lattice.
    """
    n1, n2, h, w = k.shape
    hw = h * w
    oh, ow = _stride2_offsets(h, w)
    if tile is None:
        tile = _auto_tile(hw, 2)
    t1, t2 = tile
    p1 = (-n1) % t1
    p2 = (-n2) % t2
    lane_pad = (-hw) % 128

    v1_mid, v1_out = _strided_var_pieces(v1, act, w_std, b_std)
    v2_mid, v2_out = _strided_var_pieces(v2, act, w_std, b_std)
    v1s = jnp.stack([v1, _expand_lattice(v1_mid, h, w, oh, ow)])
    v2s = jnp.stack([v2, _expand_lattice(v2_mid, h, w, oh, ow)])
    v1p = jnp.pad(v1s.reshape(2, n1, hw), ((0, 0), (0, p1), (0, lane_pad)))
    v2p = jnp.pad(v2s.reshape(2, n2, hw), ((0, 0), (0, p2), (0, lane_pad)))
    k0 = jnp.pad(k.reshape(n1, n2, hw), ((0, p1), (0, p2), (0, lane_pad)))
    scales = jnp.stack([jnp.asarray(w_std, jnp.float32) ** 2,
                        jnp.asarray(b_std, jnp.float32) ** 2])

    kernel = functools.partial(_strided_kernel, act=act, h=h, w=w)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n1 + p1, n2 + p2, hw + lane_pad),
                                       jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=((n1 + p1) // t1, (n2 + p2) // t2),
            in_specs=[
                pl.BlockSpec((t1, t2, hw + lane_pad), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((2, t1, hw + lane_pad), lambda i, j, *_: (0, i, 0)),
                pl.BlockSpec((2, t2, hw + lane_pad), lambda i, j, *_: (0, j, 0)),
            ],
            out_specs=pl.BlockSpec((t1, t2, hw + lane_pad),
                                   lambda i, j, *_: (i, j, 0)),
        ),
        interpret=INTERPRET,
    )(scales, k0, v1p, v2p)
    k_red = out[:n1, :n2, :hw].reshape(n1, n2, h, w)[:, :, oh::2, ow::2]
    return k_red, v1_out, v2_out


# ---------------------------------------------------------------------------
# Full conv-WideResNet Gram: XLA boundaries + fused tails.
# ---------------------------------------------------------------------------

def _xla_conv(k, v1, v2, strides, w_std, b_std):
    from snngp.nn.layers import _patch_mean
    w2, b2 = w_std * w_std, b_std * b_std
    n1, n2 = k.shape[:2]
    kf = w2 * _patch_mean(k.reshape((n1 * n2,) + k.shape[2:]),
                          (3, 3), strides) + b2
    return (kf.reshape((n1, n2) + kf.shape[1:]),
            w2 * _patch_mean(v1, (3, 3), strides) + b2,
            w2 * _patch_mean(v2, (3, 3), strides) + b2)


def _xla_act(k, v1, v2, act):
    from snngp.nn.layers import _relu_t, _erf_t
    t_fn = {"relu": _relu_t, "erf": _erf_t}[act]
    kn = t_fn(k, v1[:, None, :, :], v2[None, :, :, :])
    return kn, t_fn(v1, v1, v1), t_fn(v2, v2, v2)


def _mismatch_block(k, v1, v2, strides, act, w_std, b_std):
    """Group-leading block: act->conv(s)->act->conv(1) + conv(s) shortcut."""
    ka, va1, va2 = _xla_act(k, v1, v2, act)
    kc, vc1, vc2 = _xla_conv(ka, va1, va2, strides, w_std, b_std)
    kb, vb1, vb2 = _xla_act(kc, vc1, vc2, act)
    km, vm1, vm2 = _xla_conv(kb, vb1, vb2, (1, 1), w_std, b_std)
    ks, vs1, vs2 = _xla_conv(k, v1, v2, strides, w_std, b_std)   # shortcut
    return km + ks, vm1 + vs1, vm2 + vs2


def _reference_conv_resnet(x1, x2, depth, num_class, act, w_std, b_std, last_w_std):
    from snngp.nn.arch import get_conv_resnet_layer
    from snngp.nn.layers import kernel_fn_of
    kfn = kernel_fn_of(get_conv_resnet_layer(depth, num_class, act,
                                             w_std, b_std, last_w_std))
    return kfn(x1, x2, get="nngp")


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _conv_resnet_gram(depth, num_class, act, x1, x2, w_std, b_std, last_w_std):
    # Input moment + initial Conv16 (XLA).
    c = x1.shape[-1]
    k = jnp.einsum("ihwc,jhwc->ijhw", x1, x2) / c
    v1 = jnp.mean(x1 * x1, axis=-1)
    v2 = jnp.mean(x2 * x2, axis=-1)
    k, v1, v2 = _xla_conv(k, v1, v2, (1, 1), w_std, b_std)

    for g, strides in enumerate([(1, 1), (2, 2), (2, 2), (2, 2)]):
        if strides == (1, 1):
            # Stride-1 group: the mismatch block fuses too.
            k, v1, v2 = resnet_tail_blocks(k, v1, v2, nblocks=depth, act=act,
                                           w_std=w_std, b_std=b_std,
                                           mismatch=True)
        else:
            # Stride-2 group boundary: fused at full res + lattice subsample.
            k, v1, v2 = strided_mismatch_block(k, v1, v2, act=act,
                                               w_std=w_std, b_std=b_std)
            if depth > 1:
                k, v1, v2 = resnet_tail_blocks(k, v1, v2, nblocks=depth - 1,
                                               act=act, w_std=w_std, b_std=b_std)
    # Flatten + Dense(num_class, last_w_std).
    last2 = jnp.asarray(last_w_std, jnp.float32) ** 2
    return last2 * jnp.mean(k, axis=(2, 3))


def _fwd(depth, num_class, act, x1, x2, w_std, b_std, last_w_std):
    out = _conv_resnet_gram(depth, num_class, act, x1, x2, w_std, b_std, last_w_std)
    return out, (x1, x2, w_std, b_std, last_w_std)


def _bwd(depth, num_class, act, res, g):
    x1, x2, w_std, b_std, last_w_std = res
    _, vjp = jax.vjp(
        lambda a, b, ww, bs, l: _reference_conv_resnet(
            a, b, depth, num_class, act, ww, bs, l),
        x1, x2, w_std, b_std, last_w_std)
    return vjp(g)


_conv_resnet_gram.defvjp(_fwd, _bwd)


def conv_resnet_gram(x1: jax.Array, x2: jax.Array, *, depth: int,
                     num_class: int = 1, act: str = "relu",
                     w_std, b_std, last_w_std) -> jax.Array:
    """Fused conv-WideResNet NNGP Gram — drop-in for
    ``arch.get_conv_resnet_kernel(depth, ...)(x1, x2, get="nngp")``."""
    if act not in _ACT_T:
        raise KeyError(f"unsupported act '{act}'")
    return _conv_resnet_gram(depth, num_class, act,
                             x1.astype(jnp.float32), x2.astype(jnp.float32),
                             jnp.asarray(w_std, jnp.float32),
                             jnp.asarray(b_std, jnp.float32),
                             jnp.asarray(last_w_std, jnp.float32))
