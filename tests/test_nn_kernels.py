"""NNGP/NTK engine tests: closed forms vs brute-force finite-width MC, layer
algebra consistency, gradients through the recursion (SURVEY.md §4 "unit")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snngp.nn import arch, layers as L
from snngp.nn.state import input_state


def mc_kernel(layer, x, n_samples, key=0):
    """Empirical output covariance over random finite-width nets."""
    def sample(k):
        _, params = layer.init(k, x.shape)
        return layer.apply(params, x)
    keys = jax.random.split(jax.random.PRNGKey(key), n_samples)
    outs = jax.lax.map(sample, keys, batch_size=64)  # [S, N, C]
    outs = outs.reshape(n_samples, x.shape[0], -1)
    return jnp.einsum("snc,smc->nm", outs, outs) / (n_samples * outs.shape[-1])


@pytest.mark.parametrize("act", ["relu", "erf"])
@pytest.mark.slow
def test_mlp_kernel_matches_finite_width_mc(act):
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 6))
    kfn = arch.get_mlp_kernel(2, 1, act, w_std=1.2, b_std=0.3, last_w_std=0.8)
    K = kfn(x, x, get="nngp")
    layer = arch.get_mlp_layer(2, 1, act, 1.2, 0.3, 0.8, width=768)
    K_mc = mc_kernel(layer, x, 1500)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_mc), atol=0.06)


@pytest.mark.parametrize("act", ["relu", "erf"])
@pytest.mark.slow
def test_cnn_kernel_matches_finite_width_mc(act):
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 5, 2))
    kfn = arch.get_cnn_kernel(2, 1, act, w_std=1.1, b_std=0.2, last_w_std=1.0)
    K = kfn(x, x, get="nngp")
    layer = arch.get_cnn_layer(2, 1, act, 1.1, 0.2, 1.0, channels=256)
    K_mc = mc_kernel(layer, x, 800)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_mc), atol=0.08)


@pytest.mark.slow
def test_dense_resnet_kernel_matches_finite_width_mc():
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 6))
    kfn = arch.get_dense_resnet_kernel(2, 1, "relu", w_std=1.0, b_std=0.1, last_w_std=1.0)
    K = kfn(x, x, get="nngp")
    layer = arch.get_dense_resnet_layer(2, 1, "relu", 1.0, 0.1, 1.0, width=768)
    K_mc = mc_kernel(layer, x, 1500)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_mc), atol=0.1)


def test_conv_resnet_kernel_runs_and_is_psd():
    x = jax.random.normal(jax.random.PRNGKey(3), (6, 8, 8, 3))
    kfn = arch.get_conv_resnet_kernel(1, 3, "relu", w_std=1.0, b_std=0.1, last_w_std=1.0)
    K = kfn(x, x, get="nngp")
    assert K.shape == (6, 6)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K.T), rtol=1e-5)
    evals = np.linalg.eigvalsh(np.asarray(K))
    assert evals.min() > -1e-5


def test_conv_resnet_strided_downsampling_shapes():
    # WideResNet groups halve spatial dims 3 times: 8 -> 4 -> 2 -> 1.
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 3))
    lay = arch.get_conv_resnet_layer(1, 3, "relu", 1.0, 0.0, 1.0)
    K = L.kernel_fn_of(lay)(x, None, get="nngp")
    assert K.shape == (2, 2)
    # Finite-width path produces matching flattened feature shapes.
    shape, params = lay.init(jax.random.PRNGKey(0), x.shape)
    out = lay.apply(params, x)
    assert out.shape == (2, 3)


def test_cross_kernel_consistent_with_full_gram():
    x1 = jax.random.normal(jax.random.PRNGKey(5), (4, 6))
    x2 = jax.random.normal(jax.random.PRNGKey(6), (3, 6))
    kfn = arch.get_mlp_kernel(3, 1, "relu", w_std=1.3, b_std=0.2, last_w_std=0.9)
    K12 = kfn(x1, x2, get="nngp")
    Kfull = kfn(jnp.concatenate([x1, x2]), None, get="nngp")
    np.testing.assert_allclose(np.asarray(K12), np.asarray(Kfull[:4, 4:]), rtol=1e-5)


def test_erf_closed_form_against_quadrature():
    # E[erf(u) erf(v)] for correlated Gaussians vs 2D Gauss-Hermite quadrature.
    v1, v2, k = 1.4, 0.7, 0.5
    from numpy.polynomial.hermite_e import hermegauss
    zs, ws = hermegauss(80)
    Z1, Z2 = np.meshgrid(zs, zs)
    W = np.outer(ws, ws) / (2 * np.pi)
    # u = sqrt(v1) z1 ; v = (k/sqrt(v1)) z1 + sqrt(v2 - k^2/v1) z2
    from scipy.special import erf
    u = np.sqrt(v1) * Z1
    v = (k / np.sqrt(v1)) * Z1 + np.sqrt(v2 - k ** 2 / v1) * Z2
    expect = np.sum(W * erf(u) * erf(v))
    got = float(L._erf_t(jnp.array(k), jnp.array(v1), jnp.array(v2)))
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_relu_closed_form_against_quadrature():
    v1, v2, k = 1.1, 0.9, -0.3
    from numpy.polynomial.hermite_e import hermegauss
    zs, ws = hermegauss(120)
    Z1, Z2 = np.meshgrid(zs, zs)
    W = np.outer(ws, ws) / (2 * np.pi)
    u = np.sqrt(v1) * Z1
    v = (k / np.sqrt(v1)) * Z1 + np.sqrt(v2 - k ** 2 / v1) * Z2
    expect = np.sum(W * np.maximum(u, 0) * np.maximum(v, 0))
    got = float(L._relu_t(jnp.array(k), jnp.array(v1), jnp.array(v2)))
    # Gauss-Hermite converges slowly at the ReLU kink; 1e-3 is the quadrature
    # error, not the closed form's (MC agrees with the closed form to 1e-4).
    np.testing.assert_allclose(got, expect, atol=1e-3)


def test_gradients_finite_at_gram_diagonal():
    x = jax.random.normal(jax.random.PRNGKey(7), (6, 5))

    def f(w):
        kfn = arch.get_mlp_kernel(3, 1, "relu", w_std=w, b_std=0.1, last_w_std=1.0)
        return jnp.sum(kfn(x, x, get="nngp"))

    g = jax.grad(f)(1.3)
    fd = (f(1.3 + 5e-4) - f(1.3 - 5e-4)) / 1e-3
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)


@pytest.mark.slow
def test_ntk_recursion_matches_finite_width_mc():
    # Empirical NTK of finite nets, averaged over inits, -> analytic NTK.
    x = jax.random.normal(jax.random.PRNGKey(8), (3, 4))
    kfn = arch.get_mlp_kernel(2, 1, "relu", w_std=1.0, b_std=0.5, last_w_std=1.0)
    theta = kfn(x, x, get="ntk")

    layer = arch.get_mlp_layer(2, 1, "relu", 1.0, 0.5, 1.0, width=512)

    def empirical_ntk(key):
        _, params = layer.init(key, x.shape)
        jac = jax.jacobian(lambda p: layer.apply(p, x)[:, 0])(params)
        leaves = jax.tree_util.tree_leaves(jac)
        return sum(jnp.tensordot(l, l, axes=(tuple(range(1, l.ndim)),) * 2)
                   for l in leaves)

    keys = jax.random.split(jax.random.PRNGKey(9), 40)
    ntk_mc = jnp.mean(jax.lax.map(empirical_ntk, keys), axis=0)
    np.testing.assert_allclose(np.asarray(theta), np.asarray(ntk_mc), atol=0.25)


def test_input_state_matches_raw_second_moment():
    x = jax.random.normal(jax.random.PRNGKey(10), (3, 8))
    st = input_state(x, None)
    np.testing.assert_allclose(np.asarray(st.nngp), np.asarray(x @ x.T / 8), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st.var1), np.diag(np.asarray(st.nngp)), rtol=1e-6)


@pytest.mark.slow
def test_cnn_ntk_matches_finite_width_mc():
    x = jax.random.normal(jax.random.PRNGKey(11), (3, 4, 4, 1))
    kfn = arch.get_cnn_kernel(1, 1, "relu", w_std=1.0, b_std=0.3, last_w_std=1.0)
    theta = kfn(x, x, get="ntk")

    layer = arch.get_cnn_layer(1, 1, "relu", 1.0, 0.3, 1.0, channels=256)

    def empirical_ntk(key):
        _, params = layer.init(key, x.shape)
        jac = jax.jacobian(lambda p: layer.apply(p, x)[:, 0])(params)
        leaves = jax.tree_util.tree_leaves(jac)
        return sum(jnp.tensordot(l, l, axes=(tuple(range(1, l.ndim)),) * 2)
                   for l in leaves)

    keys = jax.random.split(jax.random.PRNGKey(12), 30)
    ntk_mc = jnp.mean(jax.lax.map(empirical_ntk, keys), axis=0)
    np.testing.assert_allclose(np.asarray(theta), np.asarray(ntk_mc), atol=0.2)


@pytest.mark.slow
def test_conv_resnet_kernel_matches_finite_width_mc():
    """WideResNet NNGP vs finite-width MC (VERDICT r1 item 5): the strided
    residual groups' covariance propagation against brute force at k=4."""
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 8, 8, 3))
    kfn = arch.get_conv_resnet_kernel(1, 1, "relu", w_std=1.0, b_std=0.1,
                                      last_w_std=1.0)
    K = kfn(x, x, get="nngp")
    layer = arch.get_conv_resnet_layer(1, 1, "relu", 1.0, 0.1, 1.0, k=4)
    K_mc = mc_kernel(layer, x, 400)
    # S=400 at widths 32..256: measured max dev 0.035.
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_mc), atol=0.06)


@pytest.mark.slow
def test_conv_resnet_ntk_matches_finite_width_mc():
    """WideResNet NTK vs empirical NTK averaged over inits (VERDICT r1 item 5)."""
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 8, 8, 3))
    kfn = arch.get_conv_resnet_kernel(1, 1, "relu", w_std=1.0, b_std=0.1,
                                      last_w_std=1.0)
    theta = kfn(x, x, get="ntk")

    layer = arch.get_conv_resnet_layer(1, 1, "relu", 1.0, 0.1, 1.0, k=2)

    def empirical_ntk(key):
        _, params = layer.init(key, x.shape)
        jac = jax.jacobian(lambda p: layer.apply(p, x)[:, 0])(params)
        leaves = jax.tree_util.tree_leaves(jac)
        return sum(jnp.tensordot(l, l, axes=(tuple(range(1, l.ndim)),) * 2)
                   for l in leaves)

    keys = jax.random.split(jax.random.PRNGKey(1), 24)
    ntk_mc = jnp.mean(jax.lax.map(empirical_ntk, keys), axis=0)
    # k=2, 24 inits: measured max dev 0.16 at kernel scale ~3.3.
    np.testing.assert_allclose(np.asarray(theta), np.asarray(ntk_mc), atol=0.35)


def test_arch_myrtle_kernel_matches_full_tier():
    """arch.get_myrtle_kernel (the KERNELS['myrtle'] builder) falls back to
    the XLA full tier off-TPU and matches full.get_myrtle_kernel exactly;
    the fused auto-dispatch path itself is covered by
    tests/test_myrtle_pallas.py in interpret mode."""
    from snngp.nn.full import get_myrtle_kernel as full_myrtle
    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.rand(3, 8, 8, 3), jnp.float32)
    x2 = jnp.asarray(rng.rand(4, 8, 8, 3), jnp.float32)
    kfn = arch.get_myrtle_kernel(5, 1, "relu", w_std=1.2, b_std=0.2,
                                 last_w_std=0.9, trainable_inputs=False)
    want = full_myrtle(5, 1, "relu", w_std=1.2, b_std=0.2,
                       last_w_std=0.9)(x1, x2, get="nngp")
    got = kfn(x1, x2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-7)
    assert "myrtle" in arch.KERNELS
