"""Pallas TPU kernel: fused CNN-NNGP Gram (matched-pixel tier).

The classification hot loop (SVSP: ``K(x_batch, Z)``, ``K(Z, Z)`` every step,
``spax/models.py:37-39``) runs a depth-L conv recursion over [N1, N2, H, W]
states. XLA materializes each layer's state in HBM (conv ops break elementwise
fusion): ~2 L N^2 HW floats of traffic. This kernel:

- computes the input pixel moment once outside (one [N1, N2, HW] array),
- runs the entire depth recursion per (T1, T2) tile in VMEM — the 3x3 SAME
  stencil becomes 9 masked lane-rolls on the flattened HW axis, activations
  use prefetched per-layer variance maps — and writes only the final
  [N1, N2] flattened Gram.

Supports the reference CNN architecture (Conv 3x3 SAME stride 1 + act, depth
L, Flatten + Dense readout; ``experiments/nt_kernels.py:34-45``).
Differentiable via custom VJP through the reference-tier recursion.

VMEM constraint (measured): Mosaic's scoped-vmem stack keeps ~5-7 live copies
of the k block through the stencil/activation chain (a 5.8 MB block demanded
40.6 MB scoped against the 16 MB limit), so ``_auto_tile`` caps the block at
~1.5 MB. Two tile layouts satisfy it:

- hw <= 256: wide (t1, 128) tiles with a 2-D output block;
- 256 < hw <= 1024 (CIFAR/SVHN 32x32): narrow (t1, 8) tiles with a 3-D
  [N1, N2, 1] output whose full last dim releases the 128-lane output
  constraint (see ``_cnn_gram_pallas``) — measured 2.4x the XLA tier at
  32x32 with 3e-7 parity.

The dispatch gate in ``snngp.nn.arch.get_cnn_kernel`` is hw <= 1024.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snngp.ops.pallas.gram import _ACT_T, _ACT_T_PARTIALS

__all__ = ["cnn_gram"]

INTERPRET = False


def _conv_var_stack(x: jax.Array, depth: int, act: str, w_std, b_std):
    """Per-layer pre-activation variance maps [depth + 1, N, H, W] via the
    cheap matched-pixel recursion (runs outside the kernel)."""
    from snngp.nn.layers import _patch_mean, _relu_t, _erf_t
    t_fn = {"relu": _relu_t, "erf": _erf_t}[act]
    w2, b2 = w_std * w_std, b_std * b_std
    v = jnp.mean(x * x, axis=-1)          # [N, H, W]
    out = [v]
    for _ in range(depth):
        v = w2 * _patch_mean(v, (3, 3), (1, 1)) + b2
        out.append(v)
        v = t_fn(v, v, v)                  # post-activation variance
    return jnp.stack(out)                  # [depth+1, N, H, W] (pre-act)


def _kernel(scale_ref, k0_ref, v1_ref, v2_ref, out_ref, *, depth: int,
            act: str, h: int, w: int, out3d: bool = False):
    w2 = scale_ref[0]
    b2 = scale_ref[1]
    last2 = scale_ref[2]

    t_fn = _ACT_T[act]
    hw = h * w
    hw_pad = k0_ref.shape[-1]              # HW padded to the 128-lane grid
    k = k0_ref[:]                          # [T1, T2, HW_pad]

    # Lane-index bookkeeping for the 3x3 SAME stencil on flattened HW.
    # Mosaic rejects rolls on non-128-multiple minor axes, so the wrapper
    # zero-pads HW; masks keep padded lanes out of every valid output.
    p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, hw_pad), 2)
    col = p % w
    row = p // w
    in_img = p < hw
    col_lo = (col >= 1) & in_img           # col - 1 valid
    col_hi = (col < w - 1) & in_img        # col + 1 valid
    row_lo = (row >= 1) & in_img
    row_hi = (row < h - 1) & in_img

    def stencil(z):
        # Separable 3x3 mean: column pass then row pass (6 rolls, not 27 —
        # keeps Mosaic's live-range pressure inside VMEM). Roll shifts are
        # modulo hw_pad (the physical axis length).
        zc = (z
              + jnp.where(col_lo, pltpu.roll(z, shift=1, axis=2), 0.0)
              + jnp.where(col_hi, pltpu.roll(z, shift=hw_pad - 1, axis=2), 0.0))
        zr = (zc
              + jnp.where(row_lo, pltpu.roll(zc, shift=w, axis=2), 0.0)
              + jnp.where(row_hi, pltpu.roll(zc, shift=hw_pad - w, axis=2), 0.0))
        return zr / 9.0

    for layer in range(depth):
        k = w2 * stencil(k) + b2                       # Conv 3x3 SAME
        v1 = v1_ref[layer + 1, :, :]                   # [T1, HW_pad]
        v2 = v2_ref[layer + 1, :, :]                   # [T2, HW_pad]
        k = t_fn(k, v1[:, None, :], v2[None, :, :])    # dual activation
    # Flatten (spatial mean over the true HW lanes) + final Dense.
    r = (last2 / hw) * jnp.sum(jnp.where(in_img, k, 0.0), axis=2)
    out_ref[:] = r[:, :, None] if out3d else r


def _cnn_gram_pallas(k0, v1s, v2s, scales, *, depth, act, h, w, tile):
    """Two tile layouts, chosen by ``tile[1]``:

    - wide (t2 = 128): 2-D output block (t1, 128) — t1 is the sublane dim of
      the output so t1 >= 8; the k block is t1*128*hw_pad*4 bytes, which fits
      the scoped-VMEM budget only for hw <= 256.
    - narrow (t2 = 8, hw > 256): 3-D output [N1, N2, 1] whose last block dim
      (1) is the full array dim — this demotes t2 to the output's *sublane*
      dim (8) and makes t1 a free leading batch dim on the k block, so the
      k block shrinks to t1*8*hw_pad*4 bytes and 32x32 images (hw = 1024)
      compile inside the same budget (VERDICT r1 item 3). The variance blocks
      keep their sublane constraint through t1, so t1 stays a multiple of 8.
    """
    n1, n2, hw = k0.shape
    rows = v1s.shape[0]
    t1, t2 = tile
    grid = (n1 // t1, n2 // t2)
    narrow = t2 < 128
    kernel = functools.partial(_kernel, depth=depth, act=act, h=h, w=w,
                               out3d=narrow)
    out_shape = jax.ShapeDtypeStruct((n1, n2, 1) if narrow else (n1, n2),
                                     jnp.float32)
    out_spec = (pl.BlockSpec((t1, t2, 1), lambda i, j, *_: (i, j, 0)) if narrow
                else pl.BlockSpec((t1, t2), lambda i, j, *_: (i, j)))
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((t1, t2, hw), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((rows, t1, hw), lambda i, j, *_: (0, i, 0)),
                pl.BlockSpec((rows, t2, hw), lambda i, j, *_: (0, j, 0)),
            ],
            out_specs=out_spec,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(9 + 10) * depth * n1 * n2 * hw,
            bytes_accessed=(n1 * n2 * hw + n1 * n2) * 4,
            transcendentals=2 * depth * n1 * n2 * hw,
        ),
        interpret=INTERPRET,
    )(scales, k0, v1s, v2s)
    return out[..., 0] if narrow else out


def _make_stencil(h, w, hw, hw_pad):
    """The separable 3x3 SAME stencil closure + the in-image lane mask
    (shared by the forward and the augmented-tangent kernels)."""
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

    return stencil, in_img


def _grad_kernel(scale_ref, k0_ref, v1_ref, v2_ref, dv1_ref, dv2_ref,
                 out_ref, dw_ref, db_ref, dl_ref, *, depth: int, act: str,
                 h: int, w: int, out3d: bool = False):
    """Augmented conv tile: primal + forward-mode tangents w.r.t. the three
    scale scalars, fused in VMEM. The conv stencil is linear, so tangents
    propagate by the same stencil; the activation partials are shared across
    tangents (see gram._gram_grad_kernel)."""
    w2, b2, last2 = scale_ref[0], scale_ref[1], scale_ref[2]
    ws, bs, ls = scale_ref[3], scale_ref[4], scale_ref[5]

    partials = _ACT_T_PARTIALS[act]
    hw = h * w
    hw_pad = k0_ref.shape[-1]
    stencil, in_img = _make_stencil(h, w, hw, hw_pad)

    k = k0_ref[:]
    dkw = jnp.zeros_like(k)
    dkb = jnp.zeros_like(k)
    for layer in range(depth):
        sk = stencil(k)
        u = w2 * sk + b2                                  # Conv 3x3 SAME
        duw = w2 * stencil(dkw) + (2.0 * ws) * sk
        dub = w2 * stencil(dkb) + 2.0 * bs
        v1 = v1_ref[layer + 1, :, :][:, None, :]
        v2 = v2_ref[layer + 1, :, :][None, :, :]
        t, tk, tv1, tv2 = partials(u, v1, v2)
        dkw = (tk * duw
               + tv1 * dv1_ref[0, layer + 1, :, :][:, None, :]
               + tv2 * dv2_ref[0, layer + 1, :, :][None, :, :])
        dkb = (tk * dub
               + tv1 * dv1_ref[1, layer + 1, :, :][:, None, :]
               + tv2 * dv2_ref[1, layer + 1, :, :][None, :, :])
        k = t
    # Flatten (spatial mean over true HW lanes) + final Dense, per output.
    def flat(z, s):
        r = (s / hw) * jnp.sum(jnp.where(in_img, z, 0.0), axis=2)
        return r[:, :, None] if out3d else r

    out_ref[:] = flat(k, last2)
    dw_ref[:] = flat(dkw, last2)
    db_ref[:] = flat(dkb, last2)
    dl_ref[:] = flat(k, 2.0 * ls)


def _conv_var_stack_with_tangents(x, depth, act, w_std, b_std):
    """(v, dv/dw_std, dv/db_std) for the matched-pixel variance maps, via
    forward-mode AD of the O(N HW depth) recursion."""
    v, dv_w = jax.jvp(
        lambda ww: _conv_var_stack(x, depth, act, ww, b_std),
        (w_std,), (jnp.ones_like(w_std),))
    _, dv_b = jax.jvp(
        lambda bb: _conv_var_stack(x, depth, act, w_std, bb),
        (b_std,), (jnp.ones_like(b_std),))
    return v, jnp.stack([dv_w, dv_b])


def _cnn_gram_grads(depth, act, tile, x1, x2, w_std, b_std, last_w_std):
    """Fused primal + the three scalar tangent Grams for the CNN recursion."""
    n1, h, w, c = x1.shape
    n2 = x2.shape[0]
    t1, t2 = tile
    p1 = (-n1) % t1
    p2 = (-n2) % t2
    x1p = jnp.pad(x1.astype(jnp.float32), ((0, p1), (0, 0), (0, 0), (0, 0)))
    x2p = jnp.pad(x2.astype(jnp.float32), ((0, p2), (0, 0), (0, 0), (0, 0)))

    hw = h * w
    lane_pad = (-hw) % 128
    m1, m2 = n1 + p1, n2 + p2
    k0 = jnp.einsum("ihwc,jhwc->ijhw", x1p, x2p).reshape(m1, m2, hw) / c
    k0 = jnp.pad(k0, ((0, 0), (0, 0), (0, lane_pad)))

    w_std = jnp.asarray(w_std, jnp.float32)
    b_std = jnp.asarray(b_std, jnp.float32)
    last_w_std = jnp.asarray(last_w_std, jnp.float32)

    def prep(v):
        v = v.reshape(v.shape[:-3] + (-1, hw))
        return jnp.pad(v, ((0, 0),) * (v.ndim - 1) + ((0, lane_pad),))

    v1s, dv1s = _conv_var_stack_with_tangents(x1p, depth, act, w_std, b_std)
    v2s, dv2s = _conv_var_stack_with_tangents(x2p, depth, act, w_std, b_std)
    v1s, dv1s, v2s, dv2s = prep(v1s), prep(dv1s), prep(v2s), prep(dv2s)

    scales = jnp.stack([w_std ** 2, b_std ** 2, last_w_std ** 2,
                        w_std, b_std, last_w_std])

    rows = depth + 1
    grid = (m1 // t1, m2 // t2)
    narrow = t2 < 128
    kernel = functools.partial(_grad_kernel, depth=depth, act=act, h=h, w=w,
                               out3d=narrow)
    shp = jax.ShapeDtypeStruct((m1, m2, 1) if narrow else (m1, m2),
                               jnp.float32)
    spec = (pl.BlockSpec((t1, t2, 1), lambda i, j, *_: (i, j, 0)) if narrow
            else pl.BlockSpec((t1, t2), lambda i, j, *_: (i, j)))
    outs = pl.pallas_call(
        kernel,
        out_shape=(shp, shp, shp, shp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((t1, t2, k0.shape[-1]), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((rows, t1, k0.shape[-1]), lambda i, j, *_: (0, i, 0)),
                pl.BlockSpec((rows, t2, k0.shape[-1]), lambda i, j, *_: (0, j, 0)),
                pl.BlockSpec((2, rows, t1, k0.shape[-1]),
                             lambda i, j, *_: (0, 0, i, 0)),
                pl.BlockSpec((2, rows, t2, k0.shape[-1]),
                             lambda i, j, *_: (0, 0, j, 0)),
            ],
            out_specs=(spec, spec, spec, spec),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * (9 + 10) * depth * m1 * m2 * hw,
            bytes_accessed=(m1 * m2 * hw + 4 * m1 * m2) * 4,
            transcendentals=2 * depth * m1 * m2 * hw,
        ),
        interpret=INTERPRET,
    )(scales, k0, v1s, v2s, dv1s, dv2s)
    outs = tuple((o[..., 0] if narrow else o)[:n1, :n2] for o in outs)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _cnn_gram_scalar(depth, act, tile, x1, x2, w_std, b_std, last_w_std):
    """Fused conv Gram whose backward differentiates ONLY the scale scalars
    (ML-II contract: x1/x2 are data, cotangents zero)."""
    return _cnn_gram(depth, act, tile, x1, x2, w_std, b_std, last_w_std)


def _cnn_gram_scalar_fwd(depth, act, tile, x1, x2, w_std, b_std, last_w_std):
    out = _cnn_gram(depth, act, tile, x1, x2, w_std, b_std, last_w_std)
    return out, (x1, x2, w_std, b_std, last_w_std)


def _cnn_gram_scalar_bwd(depth, act, tile, res, g):
    x1, x2, w_std, b_std, last_w_std = res
    grad_tile = _auto_tile(x1.shape[1] * x1.shape[2], depth, n_states=3)
    _, dkw, dkb, dkl = _cnn_gram_grads(depth, act, grad_tile, x1, x2,
                                       w_std, b_std, last_w_std)
    return (jnp.zeros_like(x1), jnp.zeros_like(x2),
            jnp.sum(g * dkw), jnp.sum(g * dkb), jnp.sum(g * dkl))


_cnn_gram_scalar.defvjp(_cnn_gram_scalar_fwd, _cnn_gram_scalar_bwd)


def _reference_cnn(x1, x2, depth, act, w_std, b_std, last_w_std):
    # Build from the layer combinators directly: get_cnn_kernel would
    # auto-dispatch back into cnn_gram on TPU and the custom VJP would
    # recurse into itself.
    from snngp.nn.arch import get_cnn_layer
    from snngp.nn.layers import kernel_fn_of
    kfn = kernel_fn_of(get_cnn_layer(depth, 1, act, w_std, b_std, last_w_std))
    return kfn(x1, x2, get="nngp")


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _cnn_gram(depth, act, tile, x1, x2, w_std, b_std, last_w_std):
    n1, h, w, c = x1.shape
    n2 = x2.shape[0]
    t1, t2 = tile
    p1 = (-n1) % t1
    p2 = (-n2) % t2
    x1p = jnp.pad(x1.astype(jnp.float32), ((0, p1), (0, 0), (0, 0), (0, 0)))
    x2p = jnp.pad(x2.astype(jnp.float32), ((0, p2), (0, 0), (0, 0), (0, 0)))

    hw = h * w
    lane_pad = (-hw) % 128
    k0 = jnp.einsum("ihwc,jhwc->ijhw", x1p, x2p).reshape(n1 + p1, n2 + p2, hw) / c
    k0 = jnp.pad(k0, ((0, 0), (0, 0), (0, lane_pad)))

    # NB: the leading (layer) dim of the 3-D variance blocks is a plain batch
    # dim — only the last two dims are tile-constrained — so no sublane pad.
    v1s = _conv_var_stack(x1p, depth, act, w_std, b_std).reshape(depth + 1, n1 + p1, hw)
    v2s = _conv_var_stack(x2p, depth, act, w_std, b_std).reshape(depth + 1, n2 + p2, hw)
    v1s = jnp.pad(v1s, ((0, 0), (0, 0), (0, lane_pad)))
    v2s = jnp.pad(v2s, ((0, 0), (0, 0), (0, lane_pad)))

    scales = jnp.stack([
        jnp.asarray(w_std, jnp.float32) ** 2,
        jnp.asarray(b_std, jnp.float32) ** 2,
        jnp.asarray(last_w_std, jnp.float32) ** 2,
    ])
    out = _cnn_gram_pallas(k0, v1s, v2s, scales, depth=depth, act=act,
                           h=h, w=w, tile=tile)
    return out[:n1, :n2]


def _cnn_gram_fwd(depth, act, tile, x1, x2, w_std, b_std, last_w_std):
    out = _cnn_gram(depth, act, tile, x1, x2, w_std, b_std, last_w_std)
    return out, (x1, x2, w_std, b_std, last_w_std)


def _cnn_gram_bwd(depth, act, tile, res, g):
    x1, x2, w_std, b_std, last_w_std = res
    _, vjp = jax.vjp(
        lambda a, b, ww, bs, l: _reference_cnn(a, b, depth, act, ww, bs, l),
        x1, x2, w_std, b_std, last_w_std)
    return vjp(g)


_cnn_gram.defvjp(_cnn_gram_fwd, _cnn_gram_bwd)


def _auto_tile(hw: int, depth: int, n_states: int = 1) -> Tuple[int, int]:
    """Tile sized so the kernel's *scoped* VMEM fits.

    Mosaic's scoped-vmem stack holds ~7 live copies of the k block through the
    stencil chain (z, two rolled copies, zc, ... — measured from compile-time
    OOM reports: a 5.8 MB block demanded 40.6 MB scoped against the 16 MB
    limit), so the k block itself must stay around ~1.5 MB.

    hw <= 256: wide layout (t1, 128) — t1 in [8, 16].
    hw > 256: narrow layout (t1, 8) with the 3-D output trick (see
    _cnn_gram_pallas); t1 sized to the same budget, e.g. 32x32 -> (24, 8).

    ``n_states``: live recursion states per tile — 1 for the forward, 3 for
    the augmented scalar-tangent kernel (k, dk/dw, dk/db); the budget is
    split accordingly."""
    hw_pad = -(-hw // 128) * 128
    block_budget = int(1.5 * 1024 * 1024) // n_states
    if hw <= 256:
        t1 = block_budget // (4 * 128 * hw_pad) // 8 * 8
        return (max(8, min(256, t1)), 128)
    t1 = block_budget // (2 * 4 * 8 * hw_pad) // 8 * 8
    return (max(8, min(256, t1)), 8)


def cnn_gram(x1: jax.Array, x2: jax.Array, *, depth: int, act: str = "relu",
             w_std, b_std, last_w_std, tile: Tuple[int, int] = None,
             trainable_inputs: bool = True) -> jax.Array:
    """Fused CNN-NNGP Gram — drop-in for
    ``arch.get_cnn_kernel(depth, ...)(x1, x2, get="nngp")`` (stride-1 SAME).

    Default tiling is sized from the image resolution so the per-program
    VMEM working set fits (28x28 images -> (8, 128) tiles; 8x8 -> (256, 128)).

    ``trainable_inputs=False`` switches the backward to the fused
    forward-mode scalar-tangent kernel (ML-II trains only the three scale
    scalars; x1/x2 cotangents are zero by contract) — see
    ``snngp.ops.pallas.gram.mlp_gram``."""
    if act not in _ACT_T:
        raise KeyError(f"unsupported act '{act}'")
    if tile is None:
        tile = _auto_tile(x1.shape[1] * x1.shape[2], depth)
    fn = _cnn_gram if trainable_inputs else _cnn_gram_scalar
    return fn(depth, act, tuple(tile), x1, x2,
              jnp.asarray(w_std, jnp.float32),
              jnp.asarray(b_std, jnp.float32),
              jnp.asarray(last_w_std, jnp.float32))
