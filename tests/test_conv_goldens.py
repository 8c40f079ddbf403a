"""External-provenance goldens for the conv/pool NNGP closed forms.

The conv and pooling recursions were previously validated only by
finite-width MC (atol 0.06-0.1) plus intra-repo tier cross-checks — a small
systematic bias in the conv stencil or pooling normalization could hide
under both. These tests derive the expected covariances INDEPENDENTLY from
first principles, in exact rational arithmetic (``fractions.Fraction``)
where the maps are linear, and pin literal constants.

First-principles model (the definition the reference inherits from
neural_tangents' NTK-parameterized stax.Conv, nt_kernels.py:34-45):

    z_out[p, j] = (w_std / sqrt(q * C)) * sum_{d in taps, c} W[d, c, j]
                  * z_in[p + d, c]  +  b_std * beta[j]

with W, beta iid N(0, 1), q = tap count (9 for 3x3), SAME zero padding.
Hence the exact cross-pixel covariance recursion

    K'[p1, p2] = (w^2 / q) * sum_d K[p1 + d, p2 + d] + b^2      (conv)
    K'[P1, P2] = (1 / win^2)^2 * sum_{p1 in P1, p2 in P2} K[p1, p2]  (2x2 pool)

where out-of-image pixels contribute 0 and the conv couples only EQUAL tap
offsets across the two arguments (iid weights). SAME alignment for odd
filters/stride 1 is centered; for stride 2 it follows lax.conv's
(out-1)*stride + filt - size total padding split low = pad // 2.

Covers VERDICT r2 "Next #4": 3x3 SAME conv on an enumerable image, one
strided case, one 2x2 average-pool case, exact to fp32 resolution, plus a
float64 hand-derivation through the ReLU arccos closed form pinned at 1e-6.
Reference semantics: /root/reference/experiments/nt_kernels.py:34-45 (stax
Conv/Relu/Flatten), neural_tangents' conv NNGP.
"""

import math
from fractions import Fraction

import numpy as np
import pytest

import jax.numpy as jnp

import snngp.nn.full as F
from snngp.nn import layers as L
from snngp.nn.state import input_state


# ---------------------------------------------------------------------------
# Independent first-principles enumeration (pure Python, exact rationals)
# ---------------------------------------------------------------------------

def _same_pad_lo(size, filt, stride):
    """lax SAME: total pad = max((ceil(size/stride)-1)*stride + filt - size, 0),
    low half = total // 2 (the convention stax.Conv inherits from lax.conv)."""
    out = -(-size // stride)
    total = max((out - 1) * stride + filt - size, 0)
    return total // 2, out


def conv_cov(K, h, w, filt, stride, w2, b2):
    """Exact conv covariance recursion on a dict K[(p1, p2)] of pixel-pair
    covariances (pixels are (i, j) tuples), via tap-offset enumeration."""
    fh, fw = filt
    sh, sw = stride
    plh, oh = _same_pad_lo(h, fh, sh)
    plw, ow = _same_pad_lo(w, fw, sw)
    q = fh * fw

    def taps(p):
        """Input pixels covered by output pixel p, keyed by tap offset."""
        i, j = p
        out = {}
        for di in range(fh):
            for dj in range(fw):
                si = i * sh - plh + di
                sj = j * sw - plw + dj
                if 0 <= si < h and 0 <= sj < w:
                    out[(di, dj)] = (si, sj)
        return out

    out = {}
    for i1 in range(oh):
        for j1 in range(ow):
            t1 = taps((i1, j1))
            for i2 in range(oh):
                for j2 in range(ow):
                    t2 = taps((i2, j2))
                    s = Fraction(0)
                    for d, p1 in t1.items():
                        if d in t2:             # only equal offsets couple
                            s += K[(p1, t2[d])]
                    out[((i1, j1), (i2, j2))] = w2 * s / q + b2
    return out, oh, ow


def pool_cov(K, h, w, win):
    """Exact non-overlapping win x win average-pool covariance."""
    oh, ow = h // win, w // win
    out = {}
    for I1 in range(oh):
        for J1 in range(ow):
            for I2 in range(oh):
                for J2 in range(ow):
                    s = Fraction(0)
                    for a in range(win):
                        for b in range(win):
                            for c in range(win):
                                for d in range(win):
                                    s += K[((I1 * win + a, J1 * win + b),
                                            (I2 * win + c, J2 * win + d))]
                    out[((I1, J1), (I2, J2))] = s / win ** 4
    return out, oh, ow


def input_cov(x1, x2):
    """K0[(p1, p2)] = sum_c x1[p1, c] x2[p2, c] / C, exact."""
    h, w, c = x1.shape
    K = {}
    for i1 in range(h):
        for j1 in range(w):
            for i2 in range(h):
                for j2 in range(w):
                    K[((i1, j1), (i2, j2))] = Fraction(
                        sum(int(x1[i1, j1, k]) * int(x2[i2, j2, k])
                            for k in range(c)), c)
    return K


def as_array(K, h, w):
    out = np.zeros((h, w, h, w))
    for ((i1, j1), (i2, j2)), v in K.items():
        out[i1, j1, i2, j2] = float(v)
    return out


def _int_images(shape, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(-3, 4, size=shape)


# ---------------------------------------------------------------------------
# Full spatial-covariance tier vs exact enumeration
# ---------------------------------------------------------------------------

def test_conv3x3_same_full_tier_matches_exact_enumeration():
    """3x3 SAME stride-1 conv on a 2x2 image: every zero-padding corner case
    is active (each patch covers at most 4 of 9 taps). Exact rationals."""
    x1 = _int_images((2, 2, 2), 0)
    x2 = _int_images((2, 2, 2), 1)
    w2, b2 = Fraction(9, 4), Fraction(1, 4)       # w_std = 3/2, b_std = 1/2

    K0 = input_cov(x1, x2)
    K1, oh, ow = conv_cov(K0, 2, 2, (3, 3), (1, 1), w2, b2)
    want = as_array(K1, oh, ow)

    st = F.full_input_state(jnp.asarray(x1, jnp.float32)[None],
                            jnp.asarray(x2, jnp.float32)[None])
    st = F.ConvF((3, 3), (1, 1), w_std=1.5, b_std=0.5)(st)
    got = np.asarray(st.nngp[0, 0])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_conv3x3_stride2_full_tier_matches_exact_enumeration():
    """3x3 SAME stride-2 conv on a 4x4 image (the WideResNet downsampling
    case, nt_kernels.py:48-80): checks the asymmetric SAME pad split."""
    x1 = _int_images((4, 4, 1), 2)
    x2 = _int_images((4, 4, 1), 3)
    w2, b2 = Fraction(4), Fraction(0)             # w_std = 2, b_std = 0

    K0 = input_cov(x1, x2)
    K1, oh, ow = conv_cov(K0, 4, 4, (3, 3), (2, 2), w2, b2)
    assert (oh, ow) == (2, 2)
    want = as_array(K1, oh, ow)

    st = F.full_input_state(jnp.asarray(x1, jnp.float32)[None],
                            jnp.asarray(x2, jnp.float32)[None])
    st = F.ConvF((3, 3), (2, 2), w_std=2.0, b_std=0.0)(st)
    got = np.asarray(st.nngp[0, 0])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_conv_pool_chain_full_tier_matches_exact_enumeration():
    """conv 3x3 -> 2x2 avg pool on 4x4 (one Myrtle group, linearized):
    pooling mixes pixel pairs — the exact 1/win^4 double sum."""
    x1 = _int_images((4, 4, 3), 4)
    x2 = _int_images((4, 4, 3), 5)
    w2, b2 = Fraction(1), Fraction(1, 9)          # w_std = 1, b_std = 1/3

    K0 = input_cov(x1, x2)
    K1, h, w = conv_cov(K0, 4, 4, (3, 3), (1, 1), w2, b2)
    K2, oh, ow = pool_cov(K1, h, w, 2)
    want = as_array(K2, oh, ow)

    st = F.full_input_state(jnp.asarray(x1, jnp.float32)[None],
                            jnp.asarray(x2, jnp.float32)[None])
    st = F.ConvF((3, 3), (1, 1), w_std=1.0, b_std=1.0 / 3.0)(st)
    st = F.AvgPoolF((2, 2))(st)
    got = np.asarray(st.nngp[0, 0])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_gap_dense_readout_matches_exact_enumeration():
    """GlobalAvgPool + Dense readout: K = last^2 * mean over all pixel
    pairs (Myrtle's readout, full.py GlobalAvgPoolF/DenseF)."""
    x1 = _int_images((2, 2, 1), 6)
    x2 = _int_images((2, 2, 1), 7)
    K0 = input_cov(x1, x2)
    K1, h, w = conv_cov(K0, 2, 2, (3, 3), (1, 1), Fraction(1), Fraction(0))
    want = Fraction(49, 16) * sum(K1.values()) / Fraction((h * w) ** 2)

    st = F.full_input_state(jnp.asarray(x1, jnp.float32)[None],
                            jnp.asarray(x2, jnp.float32)[None])
    st = F.ConvF((3, 3), (1, 1), 1.0, 0.0)(st)
    st = F.GlobalAvgPoolF()(st)
    st = F.DenseF(w_std=1.75)(st)
    np.testing.assert_allclose(float(st.nngp[0, 0]), float(want),
                               rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# Matched-pixel tier (the cnn_gram/classification path): same-pixel slices
# ---------------------------------------------------------------------------

def test_matched_pixel_conv_matches_exact_enumeration():
    """layers.Conv's matched-pixel recursion == the exact enumeration
    restricted to p1 == p2 (valid pre-Flatten; layers.py Conv docstring)."""
    x1 = _int_images((3, 3, 2), 8)
    x2 = _int_images((3, 3, 2), 9)
    w2, b2 = Fraction(9, 16), Fraction(1)         # w_std = 3/4, b_std = 1

    K0 = input_cov(x1, x2)
    K1, oh, ow = conv_cov(K0, 3, 3, (3, 3), (1, 1), w2, b2)
    want = np.array([[float(K1[((i, j), (i, j))]) for j in range(ow)]
                     for i in range(oh)])

    st = input_state(jnp.asarray(x1, jnp.float32)[None],
                     jnp.asarray(x2, jnp.float32)[None])
    st = L.Conv(1, (3, 3), (1, 1), "SAME", w_std=0.75, b_std=1.0).kfn(st)
    got = np.asarray(st.nngp[0, 0])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# Nonlinear chain: float64 hand-derivation through the ReLU arccos form
# ---------------------------------------------------------------------------

def _relu_T(k, v1, v2):
    """Cho & Saul (2009) arccos kernel of order 1, hand-coded in float64:
    T(K) = (sqrt(v1 v2 - K^2) + (pi - acos(K / sqrt(v1 v2))) K) / (2 pi)."""
    s = math.sqrt(v1 * v2)
    c = min(1.0, max(-1.0, k / s))
    th = math.acos(c)
    return (s * math.sin(th) + (math.pi - th) * k) / (2.0 * math.pi)


def test_conv_relu_conv_gap_hand_derived_float64():
    """conv -> relu -> conv -> GAP -> dense on a 2x2 image, every step
    enumerated by hand in float64 (conv steps exact rational, the ReLU
    closed form via math.acos). Pins the full nonlinear chain at 1e-6."""
    x1 = _int_images((2, 2, 2), 10)
    x2 = _int_images((2, 2, 2), 11)
    w2 = Fraction(1)
    b2 = Fraction(1, 4)

    # Exact input + conv for all three blocks (nngp, cov1, cov2).
    k12, _, _ = conv_cov(input_cov(x1, x2), 2, 2, (3, 3), (1, 1), w2, b2)
    k11, _, _ = conv_cov(input_cov(x1, x1), 2, 2, (3, 3), (1, 1), w2, b2)
    k22, _, _ = conv_cov(input_cov(x2, x2), 2, 2, (3, 3), (1, 1), w2, b2)

    # ReLU dual activation in float64 (needs the same-input diagonals).
    pix = [(i, j) for i in range(2) for j in range(2)]
    t12 = {(p, q): _relu_T(float(k12[(p, q)]),
                           float(k11[(p, p)]), float(k22[(q, q)]))
           for p in pix for q in pix}

    # Second conv (on floats now), GAP, dense.
    c12, h, w = conv_cov({k: Fraction(v).limit_denominator(10 ** 12)
                          for k, v in t12.items()}, 2, 2, (3, 3), (1, 1),
                         w2, b2)
    want = 1.21 * float(sum(c12.values())) / (h * w) ** 2

    kfn = F.full_kernel_fn(F.serial_f(
        F.ConvF((3, 3), (1, 1), 1.0, 0.5), F.ActF("relu"),
        F.ConvF((3, 3), (1, 1), 1.0, 0.5), F.GlobalAvgPoolF(),
        F.DenseF(w_std=1.1)))
    got = float(kfn(jnp.asarray(x1, jnp.float32)[None],
                    jnp.asarray(x2, jnp.float32)[None], get="nngp")[0, 0])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_pinned_literal_conv_and_gap_constants():
    """Literal rational constants, derived once by the exact enumeration
    above and pinned (VERDICT r2 Next #4 "pin literal constants at 1e-6"):

    - conv golden: x1 = [[1+2i, -3], [0, -2]] channels-interleaved as below,
      w_std = 3/2, b_std = 1/2: K1[(0,0),(0,0)] = -3/8, K1[(0,0),(1,1)] =
      -1/4, K1[(1,0),(0,1)] = 1/4, K1[(1,1),(1,1)] = -3/8.
    - GAP + Dense(1.75) golden on seeds (6, 7): 49/768.
    """
    x1 = np.array([1, 2, -3, 0, 0, 0, -2, 0]).reshape(2, 2, 2)
    x2 = np.array([2, 0, 1, -3, -2, 0, 2, -3]).reshape(2, 2, 2)
    st = F.full_input_state(jnp.asarray(x1, jnp.float32)[None],
                            jnp.asarray(x2, jnp.float32)[None])
    st = F.ConvF((3, 3), (1, 1), w_std=1.5, b_std=0.5)(st)
    got = np.asarray(st.nngp[0, 0])
    np.testing.assert_allclose(got[0, 0, 0, 0], -3.0 / 8.0, rtol=1e-6)
    np.testing.assert_allclose(got[0, 0, 1, 1], -1.0 / 4.0, rtol=1e-6)
    np.testing.assert_allclose(got[1, 0, 0, 1], 1.0 / 4.0, rtol=1e-6)
    np.testing.assert_allclose(got[1, 1, 1, 1], -3.0 / 8.0, rtol=1e-6)

    y1 = np.array([-1, -2, 0, 1]).reshape(2, 2, 1)
    y2 = np.array([1, -2, 3, 0]).reshape(2, 2, 1)
    kfn = F.full_kernel_fn(F.serial_f(
        F.ConvF((3, 3), (1, 1), 1.0, 0.0), F.GlobalAvgPoolF(),
        F.DenseF(w_std=1.75)))
    got = float(kfn(jnp.asarray(y1, jnp.float32)[None],
                    jnp.asarray(y2, jnp.float32)[None], get="nngp")[0, 0])
    np.testing.assert_allclose(got, 49.0 / 768.0, rtol=1e-6)


# ---------------------------------------------------------------------------
# WideResNet stride-2 residual block (the last family resting mostly on MC)
# ---------------------------------------------------------------------------

def conv_diag(d, h, w, filt, stride, w2, b2):
    """Diagonal (p == p) restriction of :func:`conv_cov`: matched output
    pixels couple only matched input pixels (equal tap offsets shift both
    sides identically), so variances propagate through conv on the diagonal
    alone — the invariant the matched-pixel tier is built on."""
    fh, fw = filt
    sh, sw = stride
    plh, oh = _same_pad_lo(h, fh, sh)
    plw, ow = _same_pad_lo(w, fw, sw)
    q = fh * fw
    out = {}
    for i in range(oh):
        for j in range(ow):
            s = 0
            for di in range(fh):
                for dj in range(fw):
                    si, sj = i * sh - plh + di, j * sw - plw + dj
                    if 0 <= si < h and 0 <= sj < w:
                        s += d[(si, sj)]
            out[(i, j)] = w2 * s / q + b2
    return out, oh, ow


def test_wrn_stride2_residual_block_hand_derived_float64():
    """WideResNet downsampling block — the channel-mismatch stride-2 residual
    (``nt_kernels.py:48-80``; mirrored by ``arch.get_conv_resnet_layer``'s
    ``block(strides=(2, 2), channel_mismatch=True)``) — on a 4x4 image,
    every step enumerated by hand:

        stem:     conv 3x3 s1 SAME                      (exact rational)
        main:     relu -> conv 3x3 s2 SAME -> relu -> conv 3x3 s1 SAME
        shortcut: conv 3x3 s2 SAME
        output:   K_main + K_shortcut   (zero cross-covariance: both
                  branches end in independent zero-mean convs)
        readout:  Flatten (matched-pixel spatial mean) -> Dense

    ReLU steps use the float64 arccos closed form; variances ride the
    diagonal-only conv recursion (:func:`conv_diag`). This was the last
    kernel family resting mostly on finite-width MC (atol 0.06-0.1) plus
    intra-repo tier cross-checks (VERDICT r3 next #5)."""
    x1 = _int_images((4, 4, 2), 14)
    x2 = _int_images((4, 4, 2), 15)
    w2, b2 = 1.0, 0.25                               # w_std = 1, b_std = 1/2
    lw2 = 1.21                                       # last_w_std = 1.1

    # Stem conv (floats are exact here: integer inputs, dyadic w2/b2).
    k12, h, w = conv_cov({k: float(v) for k, v in input_cov(x1, x2).items()},
                         4, 4, (3, 3), (1, 1), w2, b2)
    d11 = {p: float(v) for ((pa, pb), v) in
           conv_cov({k: float(v) for k, v in input_cov(x1, x1).items()},
                    4, 4, (3, 3), (1, 1), w2, b2)[0].items()
           if (p := pa) == pb}
    d22 = {p: float(v) for ((pa, pb), v) in
           conv_cov({k: float(v) for k, v in input_cov(x2, x2).items()},
                    4, 4, (3, 3), (1, 1), w2, b2)[0].items()
           if (p := pa) == pb}

    # Shortcut: conv s2 straight off the stem state.
    sc12, _, _ = conv_cov(k12, h, w, (3, 3), (2, 2), w2, b2)

    # Main: relu (T on the cross kernel, v/2 on variances: T(v, v, v) = v/2).
    t12 = {(p, q): _relu_T(k12[(p, q)], d11[p], d22[q])
           for p in d11 for q in d22}
    e11 = {p: v / 2.0 for p, v in d11.items()}
    e22 = {p: v / 2.0 for p, v in d22.items()}
    # conv s2: 4x4 -> 2x2.
    m12, h2, w2_ = conv_cov(t12, h, w, (3, 3), (2, 2), w2, b2)
    f11, _, _ = conv_diag(e11, h, w, (3, 3), (2, 2), w2, b2)
    f22, _, _ = conv_diag(e22, h, w, (3, 3), (2, 2), w2, b2)
    # relu -> conv s1 on the 2x2 grid.
    u12 = {(p, q): _relu_T(m12[(p, q)], f11[p], f22[q])
           for p in f11 for q in f22}
    m12, _, _ = conv_cov(u12, h2, w2_, (3, 3), (1, 1), w2, b2)

    # FanInSum, Flatten (diag mean), Dense.
    blk_diag = [m12[(p, p)] + sc12[(p, p)]
                for p in [(i, j) for i in range(h2) for j in range(w2_)]]
    want = lw2 * float(np.mean(blk_diag))

    block = L.serial(
        L.FanOut(2),
        L.parallel(
            L.serial(L.Relu(), L.Conv(8, (3, 3), (2, 2), "SAME", 1.0, 0.5),
                     L.Relu(), L.Conv(8, (3, 3), (1, 1), "SAME", 1.0, 0.5)),
            L.Conv(8, (3, 3), (2, 2), "SAME", 1.0, 0.5)),
        L.FanInSum())
    layer = L.serial(L.Conv(16, (3, 3), (1, 1), "SAME", 1.0, 0.5), block,
                     L.Flatten(), L.Dense(1, w_std=1.1))
    got = float(L.kernel_fn_of(layer)(
        jnp.asarray(x1, jnp.float32)[None],
        jnp.asarray(x2, jnp.float32)[None], get="nngp")[0, 0])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# Conv NTK: full chain enumerated by hand (previously MC-only at atol 0.2+)
# ---------------------------------------------------------------------------

def _relu_Tdot(k, v1, v2):
    """Cho & Saul (2009) degree-0 arc-cosine kernel:
    E[relu'(u) relu'(v)] = (pi - acos(K / sqrt(v1 v2))) / (2 pi)."""
    c = min(1.0, max(-1.0, k / math.sqrt(v1 * v2)))
    return (math.pi - math.acos(c)) / (2.0 * math.pi)


def test_conv_relu_conv_gap_ntk_hand_derived_float64():
    """NTK of conv -> relu -> conv -> GAP -> dense on a 2x2 image, every
    step enumerated by hand in float64 from the Jacot et al. (2018) / Lee et
    al. (2019) recursion generalized to conv (Arora et al. 2019, "On Exact
    Computation with an Infinitely Wide Neural Net", CNTK eq. 10-12):

        conv:  Theta' = K' + w^2 M(Theta)   (M = tap-offset patch mean,
                                             the same linear map as the
                                             NNGP conv recursion sans bias)
        relu:  Theta' = Theta * Tdot(K)     (degree-0 arccos kernel)
        GAP:   Theta' = mean over all pixel pairs
        dense: Theta' = K' + w^2 Theta

    The reference reaches these numbers via neural_tangents stax with
    get="ntk" (experiments/nt_kernels.py:34-45, sample.ipynb NTK panels).
    """
    x1 = _int_images((2, 2, 2), 12)
    x2 = _int_images((2, 2, 2), 13)
    w2, b2 = Fraction(1), Fraction(1, 4)
    pix = [(i, j) for i in range(2) for j in range(2)]

    # Block 1: conv (exact rationals), Theta1 = K1 (Theta0 = 0).
    k12, _, _ = conv_cov(input_cov(x1, x2), 2, 2, (3, 3), (1, 1), w2, b2)
    k11, _, _ = conv_cov(input_cov(x1, x1), 2, 2, (3, 3), (1, 1), w2, b2)
    k22, _, _ = conv_cov(input_cov(x2, x2), 2, 2, (3, 3), (1, 1), w2, b2)
    th = {pq: float(v) for pq, v in k12.items()}

    # ReLU: K -> T(K), Theta -> Theta * Tdot(K), in float64.
    t12, td = {}, {}
    for p in pix:
        for q in pix:
            v1, v2 = float(k11[(p, p)]), float(k22[(q, q)])
            t12[(p, q)] = _relu_T(float(k12[(p, q)]), v1, v2)
            th[(p, q)] *= _relu_Tdot(float(k12[(p, q)]), v1, v2)

    # Block 2: conv on floats; Theta2 = K2 + w^2 M(Theta) (b2=0 term).
    c12, h, w = conv_cov(t12, 2, 2, (3, 3), (1, 1), 1.0, 0.25)
    mth, _, _ = conv_cov(th, 2, 2, (3, 3), (1, 1), 1.0, 0.0)
    th2 = {pq: c12[pq] + mth[pq] for pq in c12}

    # GAP, then Dense(1.1): Theta_out = 1.21 K + 1.21 Theta.
    k_gap = sum(c12.values()) / (h * w) ** 2
    th_gap = sum(th2.values()) / (h * w) ** 2
    want = 1.21 * float(k_gap) + 1.21 * float(th_gap)

    kfn = F.full_kernel_fn(F.serial_f(
        F.ConvF((3, 3), (1, 1), 1.0, 0.5), F.ActF("relu"),
        F.ConvF((3, 3), (1, 1), 1.0, 0.5), F.GlobalAvgPoolF(),
        F.DenseF(w_std=1.1)))
    got = float(kfn(jnp.asarray(x1, jnp.float32)[None],
                    jnp.asarray(x2, jnp.float32)[None], get="ntk")[0, 0])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
