"""Full spatial-covariance NNGP/NTK tier — pooled conv architectures.

The matched-pixel tier (snngp/nn/layers.py) is exact only for Flatten
readouts. Average pooling mixes *different* pixels of the same input, so the
recursion must carry the full pixel-pair covariance:

    nngp: [N1, N2, H, W, H, W]   (p1 in input-1, p2 in input-2)
    cov1: [N1, H, W, H, W]       (same-input pixel-pair covariance)
    cov2: [N2, H, W, H, W]

Closed forms (all same-offset: i.i.d. filter taps only couple equal offsets):

- Conv:     K'[p1, p2] = w^2/F * sum_d K[s p1 + d, s p2 + d] + b^2
- Act:      elementwise in (p1, p2) with variances at the spatial diagonal
- AvgPool:  independent window means over p1 and p2
- GAP:      mean over all (p1, p2) -> dense [N1, N2]
- Flatten:  mean over the diagonal p1 == p2 (consistent with the cheap tier)

This is the representation behind Myrtle-style CIFAR kernels (used by
``get_myrtle_kernel``); the reference never enables pooling
(``experiments/nt_kernels.py:75``), so this tier is a framework extension
required by the north-star benchmark (BASELINE.md).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["FullKernelState", "full_input_state", "ConvF", "ActF", "AvgPoolF",
           "GlobalAvgPoolF", "FlattenF", "DenseF", "serial_f",
           "full_kernel_fn", "get_myrtle_kernel", "scan_tiled_gram"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FullKernelState:
    nngp: jax.Array            # [N1, N2, H, W, H, W] or [N1, N2] after readout
    cov1: jax.Array            # [N1, H, W, H, W] or [N1]
    cov2: jax.Array            # [N2, H, W, H, W] or [N2]
    ntk: Optional[jax.Array] = None

    @property
    def spatial(self) -> bool:
        return self.nngp.ndim == 6


def full_input_state(x1: jax.Array, x2: Optional[jax.Array], *, ntk: bool = False,
                     dtype=None) -> FullKernelState:
    """``dtype=jnp.bfloat16`` halves the (dominant) [N1,N2,H,W,H,W] state
    memory — an opt-in scale knob for Myrtle-size workloads (moments are
    contracted in fp32 before the cast)."""
    if x2 is None:
        x2 = x1
    nngp = jnp.einsum("iabc,jdec->ijabde", x1, x2) / x1.shape[-1]
    cov1 = jnp.einsum("iabc,idec->iabde", x1, x1) / x1.shape[-1]
    cov2 = jnp.einsum("iabc,idec->iabde", x2, x2) / x2.shape[-1]
    if dtype is not None:
        nngp, cov1, cov2 = (nngp.astype(dtype), cov1.astype(dtype),
                            cov2.astype(dtype))
    return FullKernelState(nngp, cov1, cov2,
                           jnp.zeros_like(nngp) if ntk else None)


def _same_pads(size: int, filt: int, stride: int) -> Tuple[int, int, int]:
    """lax SAME padding: (pad_low, pad_high, out_size)."""
    out = -(-size // stride)
    pad = max((out - 1) * stride + filt - size, 0)
    return pad // 2, pad - pad // 2, out


def _conv_pair(k: jax.Array, filter_shape, strides) -> jax.Array:
    """Same-offset stencil mean over the last two spatial *pairs*.

    k: [..., H, W, H, W]; output [..., H', W', H', W'].
    """
    fh, fw = filter_shape
    sh, sw = strides
    h, w = k.shape[-4], k.shape[-3]
    plh, phh, oh = _same_pads(h, fh, sh)
    plw, phw, ow = _same_pads(w, fw, sw)
    pads = [(0, 0)] * (k.ndim - 4) + [(plh, phh), (plw, phw)] * 2
    kp = jnp.pad(k, pads)
    acc = None
    for dh in range(fh):
        for dw in range(fw):
            sl = kp[..., dh:dh + sh * (oh - 1) + 1:sh,
                    dw:dw + sw * (ow - 1) + 1:sw,
                    dh:dh + sh * (oh - 1) + 1:sh,
                    dw:dw + sw * (ow - 1) + 1:sw]
            acc = sl if acc is None else acc + sl
    return acc / (fh * fw)


def ConvF(filter_shape=(3, 3), strides=(1, 1), w_std=1.0, b_std=0.0):
    w2, b2 = w_std * w_std, b_std * b_std

    def kfn(k: FullKernelState) -> FullKernelState:
        nngp = w2 * _conv_pair(k.nngp, filter_shape, strides) + b2
        cov1 = w2 * _conv_pair(k.cov1, filter_shape, strides) + b2
        cov2 = w2 * _conv_pair(k.cov2, filter_shape, strides) + b2
        ntk = (None if k.ntk is None
               else nngp + w2 * _conv_pair(k.ntk, filter_shape, strides))
        return FullKernelState(nngp, cov1, cov2, ntk)

    return kfn


def _diag_var(cov: jax.Array) -> jax.Array:
    """[N, H, W, H, W] -> [N, H, W] spatial-diagonal variance."""
    return jnp.einsum("nijij->nij", cov)


def ActF(act: str):
    from snngp.nn.layers import _relu_t, _relu_tdot, _erf_t, _erf_tdot
    t_fn = {"relu": _relu_t, "erf": _erf_t}[act]
    td_fn = {"relu": _relu_tdot, "erf": _erf_tdot}[act]

    def kfn(k: FullKernelState) -> FullKernelState:
        v1 = _diag_var(k.cov1)   # [N1, H, W]
        v2 = _diag_var(k.cov2)
        b1 = v1[:, None, :, :, None, None]
        b2 = v2[None, :, None, None, :, :]
        nngp = t_fn(k.nngp, b1, b2)
        ntk = None if k.ntk is None else k.ntk * td_fn(k.nngp, b1, b2)
        s1a = v1[:, :, :, None, None]
        s1b = v1[:, None, None, :, :]
        cov1 = t_fn(k.cov1, s1a, s1b)
        s2a = v2[:, :, :, None, None]
        s2b = v2[:, None, None, :, :]
        cov2 = t_fn(k.cov2, s2a, s2b)
        return FullKernelState(nngp, cov1, cov2, ntk)

    return kfn


def _pool_axis_pair(k: jax.Array, window: int, offset: int) -> jax.Array:
    """Non-overlapping window mean over spatial axes (offset, offset+1)."""
    shape = k.shape
    h, w = shape[offset], shape[offset + 1]
    assert h % window == 0 and w % window == 0, "AvgPool requires divisibility"
    new = shape[:offset] + (h // window, window, w // window, window) + shape[offset + 2:]
    return k.reshape(new).mean(axis=(offset + 1, offset + 3))


def AvgPoolF(window=(2, 2), strides=None):
    """Non-overlapping average pooling (window == strides, the Myrtle case)."""
    if strides is not None and tuple(strides) != tuple(window):
        raise NotImplementedError("only window == strides pooling")
    win = window[0]
    if window[0] != window[1]:
        raise NotImplementedError("square windows only")

    def pool_pairs(k, first_spatial_axis):
        k = _pool_axis_pair(k, win, first_spatial_axis)
        k = _pool_axis_pair(k, win, first_spatial_axis + 2)
        return k

    def kfn(k: FullKernelState) -> FullKernelState:
        nngp = pool_pairs(k.nngp, 2)
        cov1 = pool_pairs(k.cov1, 1)
        cov2 = pool_pairs(k.cov2, 1)
        ntk = None if k.ntk is None else pool_pairs(k.ntk, 2)
        return FullKernelState(nngp, cov1, cov2, ntk)

    return kfn


def GlobalAvgPoolF():
    def kfn(k: FullKernelState) -> FullKernelState:
        # Accumulate the big spatial reduction in fp32 (bf16 state mode).
        f32 = lambda a: a.astype(jnp.float32)
        nngp = jnp.mean(f32(k.nngp), axis=(2, 3, 4, 5))
        cov1 = jnp.mean(f32(k.cov1), axis=(1, 2, 3, 4))
        cov2 = jnp.mean(f32(k.cov2), axis=(1, 2, 3, 4))
        ntk = None if k.ntk is None else jnp.mean(f32(k.ntk), axis=(2, 3, 4, 5))
        return FullKernelState(nngp, cov1, cov2, ntk)

    return kfn


def FlattenF():
    """Diagonal-pixel mean: consistent with the cheap tier's Flatten."""

    def kfn(k: FullKernelState) -> FullKernelState:
        nngp = jnp.mean(jnp.einsum("mnijij->mnij", k.nngp), axis=(2, 3))
        cov1 = jnp.mean(_diag_var(k.cov1), axis=(1, 2))
        cov2 = jnp.mean(_diag_var(k.cov2), axis=(1, 2))
        ntk = (None if k.ntk is None
               else jnp.mean(jnp.einsum("mnijij->mnij", k.ntk), axis=(2, 3)))
        return FullKernelState(nngp, cov1, cov2, ntk)

    return kfn


def DenseF(w_std=1.0, b_std=0.0):
    w2, b2 = w_std * w_std, b_std * b_std

    def kfn(k: FullKernelState) -> FullKernelState:
        nngp = w2 * k.nngp + b2
        ntk = None if k.ntk is None else nngp + w2 * k.ntk
        return FullKernelState(nngp, w2 * k.cov1 + b2, w2 * k.cov2 + b2, ntk)

    return kfn


def serial_f(*kfns):
    def kfn(k):
        for f in kfns:
            k = f(k)
        return k

    return kfn


def full_kernel_fn(composed, dtype=None):
    def kernel_fn(x1, x2=None, get="nngp"):
        want = (get,) if isinstance(get, str) else tuple(get)
        state = composed(full_input_state(x1, x2, ntk="ntk" in want,
                                          dtype=dtype))
        outs = []
        for g in want:
            outs.append(state.nngp if g == "nngp" else state.ntk)
        return outs[0] if isinstance(get, str) else tuple(outs)

    return kernel_fn


def scan_tiled_gram(kernel_fn, x1, x2=None, *, tile: int = 16,
                    chunk: int = 64, remat: bool = False):
    """Assemble the N1 x N2 Gram from (tile, tile) blocks, ``chunk`` blocks
    per device dispatch via ``lax.scan``.

    The full-covariance tier carries a [t, t, H, W, H, W] state per block, so
    large-N Grams must be built tile-by-tile; through a remote-device tunnel
    each dispatch costs ~1 s of host latency, so per-block dispatch caps
    throughput at ~1 block/s regardless of chip speed. Scanning ``chunk``
    blocks inside one jitted computation amortizes that to ~1/chunk s — the
    same trick as the CLI's --scan-chunk training loops.

    Symmetric inputs (``x2 is None``) compute only the upper-triangle blocks
    and mirror. ``remat`` wraps the per-block kernel in ``jax.checkpoint`` so
    XLA frees each pooling group's 6-D state eagerly inside the scan (peak
    VMEM/HBM bound by one block, not one chunk).

    Returns the Gram as a numpy array (host-assembled).
    """
    import numpy as np
    from jax import lax

    symmetric = x2 is None
    x2_eff = x1 if symmetric else x2
    n1, n2 = x1.shape[0], x2_eff.shape[0]
    assert n1 % tile == 0 and n2 % tile == 0, "pad inputs to the tile size"
    nb1, nb2 = n1 // tile, n2 // tile

    if symmetric:
        pairs = [(i, j) for i in range(nb1) for j in range(i, nb2)]
    else:
        pairs = [(i, j) for i in range(nb1) for j in range(nb2)]
    npairs = len(pairs)
    pad = (-npairs) % chunk
    pairs = np.asarray(pairs + [pairs[-1]] * pad, np.int32)   # [P, 2]

    block_fn = lambda a, b: kernel_fn(a, b, get="nngp")
    if remat:
        block_fn = jax.checkpoint(block_fn)

    @jax.jit
    def run_chunk(idx):                                       # [chunk, 2]
        def step(_, ij):
            a = lax.dynamic_slice(x1, (ij[0] * tile,) + (0,) * (x1.ndim - 1),
                                  (tile,) + x1.shape[1:])
            b = lax.dynamic_slice(x2_eff, (ij[1] * tile,) + (0,) * (x2_eff.ndim - 1),
                                  (tile,) + x2_eff.shape[1:])
            return None, block_fn(a, b)
        _, blocks = lax.scan(step, None, idx)
        return blocks                                          # [chunk, t, t]

    out = np.zeros((n1, n2), np.float32)
    for c in range(0, len(pairs), chunk):
        blocks = np.asarray(run_chunk(jnp.asarray(pairs[c:c + chunk])))
        for (i, j), blk in zip(pairs[c:c + chunk], blocks):
            out[i * tile:(i + 1) * tile, j * tile:(j + 1) * tile] = blk
            if symmetric and j > i:
                out[j * tile:(j + 1) * tile, i * tile:(i + 1) * tile] = blk.T
    return out


def get_myrtle_kernel(depth: int = 5, num_class: int = 1, act: str = "relu",
                      w_std: float = 1.0, b_std: float = 0.0,
                      last_w_std: float = 1.0, dtype=None):
    """Myrtle-family CNN kernel (Shankar et al. 2020): conv/relu stacks with
    2x2 average pools, global average pool readout.

    depth in {5, 7, 10} selects the Myrtle-5/7/10 conv counts (1/2/3 convs
    per pooling group).
    """
    per_group = {5: (1, 1, 1), 7: (2, 2, 1), 10: (3, 3, 2)}[depth]
    conv = lambda: ConvF((3, 3), (1, 1), w_std, b_std)
    relu = lambda: ActF(act)

    stack = [conv(), relu()]
    for g, reps in enumerate(per_group):
        for _ in range(reps - 1 if g == 0 else reps):
            stack += [conv(), relu()]
        stack += [AvgPoolF((2, 2))]
    stack += [GlobalAvgPoolF(), DenseF(last_w_std)]
    return full_kernel_fn(serial_f(*stack), dtype=dtype)
