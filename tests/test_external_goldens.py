"""Parity goldens with provenance OUTSIDE this repo's code (VERDICT r1 item 5).

Every expected value here is computed in pure Python ``math`` from published
closed forms — never through snngp's own layer recursion — so a systematic
bias in the framework cannot also bias the golden:

- Erf NNGP layer: Williams (1997), "Computing with infinite networks", eq. 11:
  E[erf(u) erf(v)] = (2/pi) asin( 2 K12 / sqrt((1 + 2 K11)(1 + 2 K22)) ).
- ReLU NNGP layer: Cho & Saul (2009), "Kernel methods for deep learning",
  arc-cosine kernel of degree 1:
  E[max(u,0) max(v,0)] = (sqrt(K11 K22) / 2 pi) (sin t + (pi - t) cos t),
  t = acos(K12 / sqrt(K11 K22)); and E[max(u,0)^2] = K11 / 2.
- NNGP composition across Dense layers: Lee et al. (2018), "Deep neural
  networks as Gaussian processes", eq. 4-5: K^{l+1} = w^2 T(K^l) + b^2 with
  the input layer K^0 = w^2 (x . x' / d) + b^2.
- Exact GP posterior: Rasmussen & Williams (2006), eq. 2.19, via an explicit
  2x2 matrix inverse.

The reference reaches the same numbers through neural_tangents.stax
(/root/reference/experiments/nt_kernels.py:21-31) and
neural_tangents.predict.gradient_descent_mse_ensemble
(/root/reference/spax/kernels.py:29-32).
"""

import math

import jax.numpy as jnp
import numpy as np

from snngp.nn import arch


def _erf_t(k12, k11, k22):
    return (2.0 / math.pi) * math.asin(
        2.0 * k12 / math.sqrt((1.0 + 2.0 * k11) * (1.0 + 2.0 * k22)))


def _relu_t(k12, k11, k22):
    t = math.acos(max(-1.0, min(1.0, k12 / math.sqrt(k11 * k22))))
    return (math.sqrt(k11 * k22) / (2.0 * math.pi)) * (
        math.sin(t) + (math.pi - t) * math.cos(t))


def _mlp_nngp_pure_math(x1, x2, depth, act, w_std, b_std, last_w_std):
    """Iterated published closed forms for the 2-point MLP NNGP, in pure
    Python floats (no jax, no snngp layer code)."""
    d = len(x1)
    dot = lambda a, b: sum(ai * bi for ai, bi in zip(a, b)) / d
    # Input Dense (Lee et al. 2018 eq. 4).
    k12 = w_std ** 2 * dot(x1, x2) + b_std ** 2
    k11 = w_std ** 2 * dot(x1, x1) + b_std ** 2
    k22 = w_std ** 2 * dot(x2, x2) + b_std ** 2
    for _ in range(depth - 1):
        if act == "erf":
            t12, t11, t22 = (_erf_t(k12, k11, k22), _erf_t(k11, k11, k11),
                             _erf_t(k22, k22, k22))
        else:
            t12, t11, t22 = _relu_t(k12, k11, k22), k11 / 2.0, k22 / 2.0
        k12 = w_std ** 2 * t12 + b_std ** 2
        k11 = w_std ** 2 * t11 + b_std ** 2
        k22 = w_std ** 2 * t22 + b_std ** 2
    if act == "erf":
        t12 = _erf_t(k12, k11, k22)
    else:
        t12 = _relu_t(k12, k11, k22)
    return last_w_std ** 2 * t12


X1 = [0.8, -0.5, 1.2, 0.3]
X2 = [-0.2, 0.9, 0.4, -1.1]


def test_erf_mlp_matches_williams_formula():
    for depth in (1, 3):
        kfn = arch.get_mlp_kernel(depth, 1, "erf", w_std=1.3, b_std=0.4,
                                  last_w_std=0.9)
        got = float(kfn(jnp.asarray([X1], jnp.float32),
                        jnp.asarray([X2], jnp.float32), get="nngp")[0, 0])
        want = _mlp_nngp_pure_math(X1, X2, depth, "erf", 1.3, 0.4, 0.9)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_relu_mlp_matches_cho_saul_formula():
    for depth in (1, 4):
        kfn = arch.get_mlp_kernel(depth, 1, "relu", w_std=1.1, b_std=0.2,
                                  last_w_std=1.2)
        got = float(kfn(jnp.asarray([X1], jnp.float32),
                        jnp.asarray([X2], jnp.float32), get="nngp")[0, 0])
        want = _mlp_nngp_pure_math(X1, X2, depth, "relu", 1.1, 0.2, 1.2)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_pinned_literal_one_layer_constants():
    """Literal decimal goldens, derivable by hand from the published forms.

    x1=(1,1,0,0), x2=(1,0,1,0), d=4, w=1, b=0:
      K0_12 = 1/4, K0_11 = K0_22 = 1/2.
    Erf (Williams 1997 eq. 11): (2/pi) asin( 2 (1/4) / sqrt(2 * 2) )
      = (2/pi) asin(1/4) = 0.16086124651033248...
    ReLU (Cho & Saul 2009): t = acos((1/4) / (1/2)) = pi/3,
      K = (1/2 / 2pi)(sin(pi/3) + (2pi/3) cos(pi/3))
        = (sqrt(3)/2 + pi/3) / (4 pi) = 0.15224944526105733...
    """
    x1 = jnp.asarray([[1.0, 1.0, 0.0, 0.0]], jnp.float32)
    x2 = jnp.asarray([[1.0, 0.0, 1.0, 0.0]], jnp.float32)
    erf_kfn = arch.get_mlp_kernel(1, 1, "erf", w_std=1.0, b_std=0.0, last_w_std=1.0)
    assert abs((2.0 / math.pi) * math.asin(0.25) - 0.16086124651033248) < 1e-15
    np.testing.assert_allclose(float(erf_kfn(x1, x2, get="nngp")[0, 0]),
                               0.16086124651033248, rtol=1e-6)
    relu_kfn = arch.get_mlp_kernel(1, 1, "relu", w_std=1.0, b_std=0.0, last_w_std=1.0)
    expected = (math.sqrt(3.0) / 2.0 + math.pi / 3.0) / (4.0 * math.pi)
    assert abs(expected - 0.15224944526105733) < 1e-15
    np.testing.assert_allclose(float(relu_kfn(x1, x2, get="nngp")[0, 0]),
                               expected, rtol=1e-6)


def test_gp_predict_matches_rasmussen_williams_2x2():
    """gp_predict vs R&W (2006) eq. 2.19 with an explicit 2x2 inverse in pure
    Python, including neural_tangents' trace-relative diag_reg semantics."""
    from snngp.ops.linalg import gp_predict

    # Toy kernel: k(x, x') = exp(-|x - x'|^2 / 2) on scalars.
    xs_tr = [0.0, 1.0]
    ys = [0.3, -0.7]
    x_te = 0.4
    diag_reg = 1e-2

    def kfn(a, b, get="nngp"):
        a = jnp.asarray(a, jnp.float32).reshape(-1, 1)
        b = jnp.asarray(b, jnp.float32).reshape(-1, 1)
        return jnp.exp(-0.5 * (a - b.T) ** 2)

    mean, cov = gp_predict(kfn, jnp.asarray(xs_tr).reshape(2, 1),
                           jnp.asarray(ys).reshape(2, 1),
                           jnp.asarray([x_te]).reshape(1, 1),
                           diag_reg=diag_reg)

    k = lambda a, b: math.exp(-0.5 * (a - b) ** 2)
    # Trace-relative regularizer: r = diag_reg * mean(diag(K)) (diag is 1).
    r = diag_reg * 1.0
    a11, a12, a22 = k(0, 0) + r, k(0, 1), k(1, 1) + r
    det = a11 * a22 - a12 * a12
    i11, i12, i22 = a22 / det, -a12 / det, a11 / det
    kt1, kt2 = k(x_te, 0.0), k(x_te, 1.0)
    alpha1 = i11 * ys[0] + i12 * ys[1]
    alpha2 = i12 * ys[0] + i22 * ys[1]
    want_mean = kt1 * alpha1 + kt2 * alpha2
    v1 = i11 * kt1 + i12 * kt2
    v2 = i12 * kt1 + i22 * kt2
    want_cov = k(x_te, x_te) - (kt1 * v1 + kt2 * v2)

    np.testing.assert_allclose(float(mean[0, 0]), want_mean, rtol=1e-5)
    np.testing.assert_allclose(float(cov[0, 0]), want_cov, rtol=1e-4)


def test_erf_diagonal_matches_williams_formula():
    """Single-input variance path: erf self-kernel (2/pi) asin(2K/(1+2K))."""
    x = [0.5, -1.0, 0.25, 0.75]
    kfn = arch.get_mlp_kernel(2, 1, "erf", w_std=1.2, b_std=0.3, last_w_std=1.0)
    got = float(kfn(jnp.asarray([x], jnp.float32), None, get="nngp")[0, 0])
    want = _mlp_nngp_pure_math(x, x, 2, "erf", 1.2, 0.3, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


# ---------------------------------------------------------------------------
# NTK goldens (VERDICT r2 "conv-correctness evidence" depth: until now the
# NTK recursion was validated only by finite-width MC at atol 0.2-0.35).
# Published closed forms, iterated in pure Python floats:
#
# - NTK recursion: Jacot et al. (2018), "Neural Tangent Kernel", thm. 1 /
#   Lee et al. (2019), "Wide Neural Networks of Any Depth Evolve as Linear
#   Models", eq. 8-9 (NTK parameterization, trainable bias):
#     Dense:      K' = w^2 K + b^2,  Theta' = K' + w^2 Theta
#     activation: K' = T(K),         Theta' = Theta * Tdot(K)
#   with Theta^0 = 0 at the input embedding.
# - ReLU derivative kernel: Cho & Saul (2009) degree-0 arc-cosine kernel:
#     E[relu'(u) relu'(v)] = P(u>0, v>0) = (pi - theta) / (2 pi).
# - Erf derivative kernel: erf'(x) = (2/sqrt(pi)) exp(-x^2); the bivariate
#   Gaussian integral gives (Lee et al. 2019, app. C / Williams 1997 deriv.):
#     E[erf'(u) erf'(v)] = (4/pi) / sqrt((1+2K11)(1+2K22) - 4 K12^2).
#
# The reference reaches the same numbers via neural_tangents.stax with
# get="ntk" (experiments/nt_kernels.py:21-31, sample.ipynb posterior panels).
# ---------------------------------------------------------------------------


def _relu_tdot_pure(k12, k11, k22):
    t = math.acos(max(-1.0, min(1.0, k12 / math.sqrt(k11 * k22))))
    return (math.pi - t) / (2.0 * math.pi)


def _erf_tdot_pure(k12, k11, k22):
    det = (1.0 + 2.0 * k11) * (1.0 + 2.0 * k22) - 4.0 * k12 * k12
    return (4.0 / math.pi) / math.sqrt(det)


def _mlp_ntk_pure_math(x1, x2, depth, act, w_std, b_std, last_w_std):
    """Jacot/Lee NTK recursion for the depth-hidden MLP, pure Python floats."""
    d = len(x1)
    dot = lambda a, b: sum(ai * bi for ai, bi in zip(a, b)) / d
    k12, k11, k22 = dot(x1, x2), dot(x1, x1), dot(x2, x2)
    th = 0.0
    for _ in range(depth):
        k12 = w_std ** 2 * k12 + b_std ** 2
        k11 = w_std ** 2 * k11 + b_std ** 2
        k22 = w_std ** 2 * k22 + b_std ** 2
        th = k12 + w_std ** 2 * th
        if act == "erf":
            th *= _erf_tdot_pure(k12, k11, k22)
            k12, k11, k22 = (_erf_t(k12, k11, k22), _erf_t(k11, k11, k11),
                             _erf_t(k22, k22, k22))
        else:
            th *= _relu_tdot_pure(k12, k11, k22)
            k12, k11, k22 = _relu_t(k12, k11, k22), k11 / 2.0, k22 / 2.0
    k_out = last_w_std ** 2 * k12
    return k_out + last_w_std ** 2 * th


def test_relu_mlp_ntk_matches_jacot_recursion():
    for depth in (1, 4):
        kfn = arch.get_mlp_kernel(depth, 1, "relu", w_std=1.1, b_std=0.2,
                                  last_w_std=1.2)
        got = float(kfn(jnp.asarray([X1], jnp.float32),
                        jnp.asarray([X2], jnp.float32), get="ntk")[0, 0])
        want = _mlp_ntk_pure_math(X1, X2, depth, "relu", 1.1, 0.2, 1.2)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_erf_mlp_ntk_matches_closed_form():
    for depth in (1, 3):
        kfn = arch.get_mlp_kernel(depth, 1, "erf", w_std=1.3, b_std=0.4,
                                  last_w_std=0.9)
        got = float(kfn(jnp.asarray([X1], jnp.float32),
                        jnp.asarray([X2], jnp.float32), get="ntk")[0, 0])
        want = _mlp_ntk_pure_math(X1, X2, depth, "erf", 1.3, 0.4, 0.9)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_pinned_literal_ntk_constant():
    """Hand-derived literal: x1=(1,1,0,0), x2=(1,0,1,0), depth-1 ReLU MLP,
    w=1, b=0, last_w=1.

      K0_12 = 1/4, K0_11 = K0_22 = 1/2;  Theta after hidden Dense = 1/4.
      ReLU: t = acos((1/4)/(1/2)) = pi/3,
        T   = (sqrt(3)/2 + pi/3) / (4 pi)      = 0.15224944526105733
        Tdot = (pi - pi/3) / (2 pi) = 1/3  ->  Theta = 1/12.
      Final Dense(w=1): NTK = T + 1/12
        = 0.15224944526105733 + 0.08333333333333333
        = 0.23558277859439066.
    """
    want = (math.sqrt(3.0) / 2.0 + math.pi / 3.0) / (4.0 * math.pi) + 1.0 / 12.0
    assert abs(want - 0.23558277859439066) < 1e-15
    x1 = jnp.asarray([[1.0, 1.0, 0.0, 0.0]], jnp.float32)
    x2 = jnp.asarray([[1.0, 0.0, 1.0, 0.0]], jnp.float32)
    kfn = arch.get_mlp_kernel(1, 1, "relu", w_std=1.0, b_std=0.0, last_w_std=1.0)
    np.testing.assert_allclose(float(kfn(x1, x2, get="ntk")[0, 0]), want,
                               rtol=1e-6)
