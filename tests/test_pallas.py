"""Pallas fused-Gram kernel tests (interpreter mode on CPU; the compiled
path is exercised on real TPU by bench.py and was validated to <1e-6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import snngp.ops.pallas.gram as G
from snngp.nn import arch


@pytest.fixture(autouse=True)
def _interpret_mode():
    G.INTERPRET = True
    yield
    G.INTERPRET = False


@pytest.mark.parametrize("act", ["relu", "erf"])
def test_fused_gram_matches_reference_tier(act):
    x = jax.random.normal(jax.random.PRNGKey(0), (300, 10))
    K_p = G.mlp_gram(x, x, depth=3, act=act, w_std=1.3, b_std=0.4,
                     last_w_std=0.9, tile=(128, 128))
    kfn = arch.get_mlp_kernel(3, 1, act, w_std=1.3, b_std=0.4, last_w_std=0.9)
    K_r = kfn(x, x, get="nngp")
    np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_r), atol=2e-6)


def test_fused_gram_cross_shapes_and_padding():
    # Non-tile-multiple shapes exercise the row/col/feature padding paths.
    x1 = jax.random.normal(jax.random.PRNGKey(1), (200, 7))
    x2 = jax.random.normal(jax.random.PRNGKey(2), (150, 7))
    K_p = G.mlp_gram(x1, x2, depth=2, act="relu", w_std=1.0, b_std=0.2,
                     last_w_std=1.1, tile=(128, 128))
    kfn = arch.get_mlp_kernel(2, 1, "relu", w_std=1.0, b_std=0.2, last_w_std=1.1)
    np.testing.assert_allclose(np.asarray(K_p), np.asarray(kfn(x1, x2, get="nngp")),
                               atol=2e-6)


def test_fused_gram_gradients_match_reference():
    x = jax.random.normal(jax.random.PRNGKey(3), (140, 6))

    def f_pallas(w, b, l):
        return jnp.sum(G.mlp_gram(x, x, depth=2, act="relu", w_std=w, b_std=b,
                                  last_w_std=l, tile=(128, 128)))

    def f_ref(w, b, l):
        kfn = arch.get_mlp_kernel(2, 1, "relu", w_std=w, b_std=b, last_w_std=l)
        return jnp.sum(kfn(x, x, get="nngp"))

    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(1.2, 0.3, 0.9)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(1.2, 0.3, 0.9)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_polynomial_acos_accuracy():
    c = jnp.linspace(-1.0, 1.0, 100001)
    err = jnp.max(jnp.abs(G._acos(c) - jnp.arccos(c)))
    assert float(err) < 5e-7  # A&S 4.4.46 bound + fp32 rounding


@pytest.mark.parametrize("act", ["relu", "erf"])
def test_fused_resnet_gram_matches_reference_tier(act):
    from snngp.nn.layers import kernel_fn_of
    x = jax.random.normal(jax.random.PRNGKey(4), (260, 9))
    K_p = G.resnet_gram(x, x, depth=3, act=act, w_std=1.1, b_std=0.2,
                        last_w_std=0.8, tile=(128, 128))
    kfn = kernel_fn_of(arch.get_dense_resnet_layer(3, 1, act, 1.1, 0.2, 0.8))
    np.testing.assert_allclose(np.asarray(K_p), np.asarray(kfn(x, None, get="nngp")),
                               atol=5e-6)


def test_fused_resnet_gram_gradients():
    x = jax.random.normal(jax.random.PRNGKey(5), (140, 5))

    def f_pallas(w):
        return jnp.sum(G.resnet_gram(x, x, depth=2, act="relu", w_std=w,
                                     b_std=0.3, last_w_std=1.0, tile=(128, 128)))

    from snngp.nn.layers import kernel_fn_of

    def f_ref(w):
        kfn = kernel_fn_of(arch.get_dense_resnet_layer(2, 1, "relu", w, 0.3, 1.0))
        return jnp.sum(kfn(x, None, get="nngp"))

    np.testing.assert_allclose(float(jax.grad(f_pallas)(1.2)),
                               float(jax.grad(f_ref)(1.2)), rtol=1e-5)


def test_fused_cnn_gram_matches_reference_tier():
    import snngp.ops.pallas.conv_gram as CG
    CG.INTERPRET = True
    try:
        x1 = jax.random.normal(jax.random.PRNGKey(6), (20, 6, 6, 3))
        x2 = jax.random.normal(jax.random.PRNGKey(7), (12, 6, 6, 3))
        for act in ["relu", "erf"]:
            K_p = CG.cnn_gram(x1, x2, depth=2, act=act, w_std=1.2, b_std=0.3,
                              last_w_std=0.9, tile=(8, 8))
            kfn = arch.get_cnn_kernel(2, 1, act, w_std=1.2, b_std=0.3,
                                      last_w_std=0.9)
            np.testing.assert_allclose(np.asarray(K_p),
                                       np.asarray(kfn(x1, x2, get="nngp")),
                                       atol=2e-6)
    finally:
        CG.INTERPRET = False


@pytest.mark.slow
def test_fused_cnn_gram_gradients():
    import snngp.ops.pallas.conv_gram as CG
    CG.INTERPRET = True
    try:
        x = jax.random.normal(jax.random.PRNGKey(8), (10, 5, 5, 2))

        def f_p(w):
            return jnp.sum(CG.cnn_gram(x, x, depth=2, act="relu", w_std=w,
                                       b_std=0.2, last_w_std=1.0, tile=(8, 8)))

        def f_r(w):
            kfn = arch.get_cnn_kernel(2, 1, "relu", w_std=w, b_std=0.2,
                                      last_w_std=1.0)
            return jnp.sum(kfn(x, x, get="nngp"))

        np.testing.assert_allclose(float(jax.grad(f_p)(1.1)),
                                   float(jax.grad(f_r)(1.1)), rtol=1e-5)
    finally:
        CG.INTERPRET = False


@pytest.mark.slow
def test_fused_conv_resnet_gram_matches_reference_tier():
    import snngp.ops.pallas.resnet_conv_gram as RG
    RG.INTERPRET = True
    try:
        from snngp.nn.layers import kernel_fn_of
        x1 = jax.random.normal(jax.random.PRNGKey(9), (6, 8, 8, 3))
        x2 = jax.random.normal(jax.random.PRNGKey(10), (5, 8, 8, 3))
        for depth in [1, 3]:
            K_p = RG.conv_resnet_gram(x1, x2, depth=depth, num_class=3,
                                      act="relu", w_std=1.1, b_std=0.2,
                                      last_w_std=0.9)
            kfn = kernel_fn_of(arch.get_conv_resnet_layer(depth, 3, "relu",
                                                          1.1, 0.2, 0.9))
            np.testing.assert_allclose(np.asarray(K_p),
                                       np.asarray(kfn(x1, x2, get="nngp")),
                                       atol=3e-6)
    finally:
        RG.INTERPRET = False


@pytest.mark.slow
def test_fused_conv_resnet_gram_gradients():
    import snngp.ops.pallas.resnet_conv_gram as RG
    RG.INTERPRET = True
    try:
        from snngp.nn.layers import kernel_fn_of
        x = jax.random.normal(jax.random.PRNGKey(11), (5, 8, 8, 2))

        def f_p(w):
            return jnp.sum(RG.conv_resnet_gram(x, x, depth=2, num_class=1,
                                               act="relu", w_std=w, b_std=0.2,
                                               last_w_std=0.9))

        def f_r(w):
            kfn = kernel_fn_of(arch.get_conv_resnet_layer(2, 1, "relu", w, 0.2, 0.9))
            return jnp.sum(kfn(x, x, get="nngp"))

        np.testing.assert_allclose(float(jax.grad(f_p)(1.1)),
                                   float(jax.grad(f_r)(1.1)), rtol=1e-5)
    finally:
        RG.INTERPRET = False


@pytest.mark.slow
def test_fused_cnn_gram_narrow_layout_32x32():
    """hw > 256 narrow-tile layout (3-D output block, t2 = 8): parity vs the
    reference tier at CIFAR resolution (VERDICT r1 item 3)."""
    import snngp.ops.pallas.conv_gram as CG
    CG.INTERPRET = True
    try:
        x1 = jax.random.normal(jax.random.PRNGKey(20), (10, 32, 32, 3))
        x2 = jax.random.normal(jax.random.PRNGKey(21), (6, 32, 32, 3))
        assert CG._auto_tile(1024, 3)[1] == 8  # narrow layout engaged
        K_p = CG.cnn_gram(x1, x2, depth=3, act="relu", w_std=1.2, b_std=0.3,
                          last_w_std=0.9)
        kfn = arch.get_cnn_kernel(3, 1, "relu", w_std=1.2, b_std=0.3,
                                  last_w_std=0.9)
        want = kfn(x1, x2, get="nngp")
        err = np.max(np.abs(np.asarray(K_p) - np.asarray(want)))
        assert err / np.max(np.abs(np.asarray(want))) < 1e-5
    finally:
        CG.INTERPRET = False


@pytest.mark.slow
def test_fused_conv_resnet_gram_32x32():
    """Full WRN pipeline with hw = 1024 tail blocks through the narrow tiles."""
    import snngp.ops.pallas.conv_gram as CG
    import snngp.ops.pallas.resnet_conv_gram as RG
    CG.INTERPRET = True
    RG.INTERPRET = True
    try:
        x1 = jax.random.normal(jax.random.PRNGKey(22), (6, 32, 32, 3))
        got = RG.conv_resnet_gram(x1, x1, depth=2, num_class=1, act="relu",
                                  w_std=1.0, b_std=0.2, last_w_std=1.0)
        want = RG._reference_conv_resnet(x1, x1, 2, 1, "relu", 1.0, 0.2, 1.0)
        err = np.max(np.abs(np.asarray(got) - np.asarray(want)))
        assert err / np.max(np.abs(np.asarray(want))) < 1e-5
    finally:
        CG.INTERPRET = False
        RG.INTERPRET = False


@pytest.mark.slow
def test_fused_strided_mismatch_block():
    """Stride-2 group-boundary block fused at full resolution (dilated
    stencil + parity-lattice subsample) matches the XLA block on even, odd,
    and rectangular extents."""
    import snngp.ops.pallas.resnet_conv_gram as RG
    RG.INTERPRET = True
    try:
        rng = np.random.RandomState(0)
        for h, w in [(8, 8), (7, 7), (6, 10)]:
            n1, n2 = 5, 4
            v1 = jnp.asarray(rng.rand(n1, h, w) + 0.5, jnp.float32)
            v2 = jnp.asarray(rng.rand(n2, h, w) + 0.5, jnp.float32)
            k = (jnp.asarray(rng.rand(n1, n2, h, w), jnp.float32)
                 * jnp.sqrt(v1[:, None] * v2[None]))
            got = RG.strided_mismatch_block(k, v1, v2, act="relu", w_std=1.1,
                                            b_std=0.2, tile=(8, 8))
            want = RG._mismatch_block(k, v1, v2, (2, 2), "relu", 1.1, 0.2)
            for g, wv in zip(got, want):
                np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                           atol=1e-5)
    finally:
        RG.INTERPRET = False


# ---------------------------------------------------------------------------
# Scalar-only gradient path (ML-II): fused forward-mode tangent kernels
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("act", ["relu", "erf"])
@pytest.mark.parametrize("mode", ["mlp", "resnet"])
def test_scalar_tangent_grads_match_reference(act, mode):
    """trainable_inputs=False backward (fused tangent kernel) == reference-
    tier AD on the three scale scalars at 1e-5 (VERDICT r2 Next #2)."""
    x1 = jax.random.normal(jax.random.PRNGKey(11), (140, 6))
    x2 = jax.random.normal(jax.random.PRNGKey(12), (130, 6))
    gram = G.mlp_gram if mode == "mlp" else G.resnet_gram
    cot = jax.random.normal(jax.random.PRNGKey(13), (140, 130))

    def f_scalar(w, b, l):
        return jnp.sum(cot * gram(x1, x2, depth=2, act=act, w_std=w, b_std=b,
                                  last_w_std=l, tile=(128, 128),
                                  trainable_inputs=False))

    def f_ref(w, b, l):
        from snngp.ops.pallas.gram import _reference_recursion
        return jnp.sum(cot * _reference_recursion(x1, x2, 2, act, w, b, l,
                                                  mode=mode))

    gp = jax.grad(f_scalar, argnums=(0, 1, 2))(1.2, 0.3, 0.9)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(1.2, 0.3, 0.9)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_scalar_tangent_grads_include_gram_diagonal():
    """Symmetric Gram (x2 = x1): the diagonal hits the c = 1 guard in the
    analytic partials; grads must stay finite and match the reference tier
    (whose _relu_t carries the same analytic JVP)."""
    x = jax.random.normal(jax.random.PRNGKey(14), (130, 5))

    def f_scalar(w, b, l):
        return jnp.sum(G.mlp_gram(x, x, depth=3, act="relu", w_std=w, b_std=b,
                                  last_w_std=l, tile=(128, 128),
                                  trainable_inputs=False))

    def f_ref(w, b, l):
        from snngp.ops.pallas.gram import _reference_recursion
        return jnp.sum(_reference_recursion(x, x, 3, "relu", w, b, l))

    gp = jax.grad(f_scalar, argnums=(0, 1, 2))(1.1, 0.25, 1.0)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(1.1, 0.25, 1.0)
    for a, b in zip(gp, gr):
        assert np.isfinite(float(a))
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_scalar_tangent_value_and_grad_composition():
    """value_and_grad through a marginal-likelihood-shaped loss (Gram +
    Cholesky + quadratic form) — the actual ML-II step composition."""
    x = jax.random.normal(jax.random.PRNGKey(15), (140, 6))
    y = jax.random.normal(jax.random.PRNGKey(16), (140,))

    def nll(w, fused):
        if fused:
            K = G.mlp_gram(x, x, depth=2, act="relu", w_std=w, b_std=0.3,
                           last_w_std=1.0, tile=(128, 128),
                           trainable_inputs=False)
        else:
            from snngp.ops.pallas.gram import _reference_recursion
            K = _reference_recursion(x, x, 2, "relu", w, 0.3, 1.0)
        L = jnp.linalg.cholesky(K + 1e-2 * jnp.eye(140))
        a = jax.scipy.linalg.solve_triangular(L, y, lower=True)
        return jnp.sum(a * a) + 2.0 * jnp.sum(jnp.log(jnp.diag(L)))

    vf, gf = jax.value_and_grad(lambda w: nll(w, True))(1.3)
    vr, gr = jax.value_and_grad(lambda w: nll(w, False))(1.3)
    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
    np.testing.assert_allclose(float(gf), float(gr), rtol=1e-4)


def test_cnn_scalar_tangent_grads_match_reference():
    """Conv scalar-tangent backward (trainable_inputs=False) == reference
    tier at 1e-5, including the padding paths (non-multiple N, hw)."""
    import snngp.ops.pallas.conv_gram as CG
    CG.INTERPRET = True
    try:
        x1 = jax.random.normal(jax.random.PRNGKey(20), (10, 5, 5, 2))
        x2 = jax.random.normal(jax.random.PRNGKey(21), (9, 5, 5, 2))
        cot = jax.random.normal(jax.random.PRNGKey(22), (10, 9))

        def f_s(w, b, l):
            return jnp.sum(cot * CG.cnn_gram(
                x1, x2, depth=2, act="relu", w_std=w, b_std=b, last_w_std=l,
                tile=(8, 8), trainable_inputs=False))

        def f_r(w, b, l):
            return jnp.sum(cot * CG._reference_cnn(x1, x2, 2, "relu", w, b, l))

        gp = jax.grad(f_s, argnums=(0, 1, 2))(1.1, 0.2, 0.9)
        gr = jax.grad(f_r, argnums=(0, 1, 2))(1.1, 0.2, 0.9)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(float(a), float(b), rtol=1e-5)
    finally:
        CG.INTERPRET = False
