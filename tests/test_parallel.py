"""Distributed tests on the emulated 8-device CPU mesh: sharded Gram and
blocked/distributed Cholesky equal their single-device references."""

import jax
import jax.numpy as jnp
import numpy as np

from snngp.nn import arch
from snngp.parallel import get_mesh, sharded_gram, distributed_cholesky
from snngp.parallel.cholesky import blocked_cholesky


def _psd(n, seed=0, jitter=1e-2):
    rng = np.random.RandomState(seed)
    a = rng.randn(n, n).astype(np.float32)
    return jnp.asarray(a @ a.T / n + jitter * np.eye(n, dtype=np.float32))


def test_blocked_cholesky_matches_lapack():
    a = _psd(256, seed=1)
    got = blocked_cholesky(a, block=64)
    expect = jnp.linalg.cholesky(a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-4)


def test_blocked_cholesky_single_block():
    a = _psd(64, seed=2)
    np.testing.assert_allclose(np.asarray(blocked_cholesky(a, block=64)),
                               np.asarray(jnp.linalg.cholesky(a)), atol=1e-5)


def test_distributed_cholesky_on_mesh():
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    mesh = get_mesh(8)
    a = _psd(512, seed=3)
    got = distributed_cholesky(a, mesh, block=64)
    expect = jnp.linalg.cholesky(a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-4)


def test_sharded_gram_matches_dense():
    mesh = get_mesh(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 5))
    kfn = arch.get_mlp_kernel(2, 1, "relu", w_std=1.2, b_std=0.2, last_w_std=1.0)
    got = sharded_gram(kfn, x, mesh)
    expect = kfn(x, x, get="nngp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


def test_sharded_gram_cross():
    mesh = get_mesh(4)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 5))
    x2 = jax.random.normal(jax.random.PRNGKey(2), (12, 5))
    kfn = arch.get_mlp_kernel(1, 1, "erf", w_std=1.0, b_std=0.1, last_w_std=1.0)
    got = sharded_gram(kfn, x, mesh, x2=x2)
    expect = kfn(x, x2, get="nngp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


def test_end_to_end_sharded_solve():
    """Gram (sharded) -> distributed Cholesky -> NLL equals single-device."""
    mesh = get_mesh(8)
    x = jax.random.normal(jax.random.PRNGKey(3), (128, 6))
    y = jax.random.normal(jax.random.PRNGKey(4), (128,))
    kfn = arch.get_mlp_kernel(2, 1, "relu", w_std=1.3, b_std=0.3, last_w_std=1.0)

    K = sharded_gram(kfn, x, mesh) + 1e-4 * jnp.eye(128)
    L = distributed_cholesky(K, mesh, block=32)

    from snngp.ops.linalg import chol_logdet, chol_quad_form
    nll = 0.5 * (chol_quad_form(L, y) + chol_logdet(L) + 128 * jnp.log(2 * jnp.pi))

    K1 = kfn(x, x, get="nngp") + 1e-4 * jnp.eye(128)
    L1 = jnp.linalg.cholesky(K1)
    nll1 = 0.5 * (chol_quad_form(L1, y) + chol_logdet(L1) + 128 * jnp.log(2 * jnp.pi))
    np.testing.assert_allclose(float(nll), float(nll1), rtol=1e-4)


def test_blocked_cholesky_identity_padding():
    a = _psd(100, seed=5)  # 100 not a multiple of 64
    got = blocked_cholesky(a, block=64)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.linalg.cholesky(a)), atol=2e-4)


def test_spr_loss_on_mesh_matches_single_device():
    """SPR with mesh: sharded Gram + blocked Cholesky == monolithic loss."""
    from snngp.models import SPR, NNGPKernel, StudentTLikelihood
    rng = np.random.RandomState(11)
    x = rng.randn(64, 4).astype(np.float32)
    y = rng.randn(64).astype(np.float32)

    def get_kernel_fn(w, b, l):
        return arch.get_mlp_kernel(2, act="relu", w_std=w, b_std=b, last_w_std=l)

    def build(mesh):
        kernel = NNGPKernel(get_kernel_fn, 1.0, 0.5, 1.0)
        lik = StudentTLikelihood(2.0, 2.0)
        return SPR(kernel, lik, x, y, jnp.array(0.0), jnp.array(1.0),
                   eps=1e-3, mesh=mesh, chol_block=16)

    single = build(None)
    dist = build(get_mesh(8))
    p = single.init_params()
    l1 = float(jax.jit(single.loss)(p))
    l2 = float(jax.jit(dist.loss)(p))
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    g1 = jax.grad(single.loss)(p)
    g2 = jax.grad(dist.loss)(p)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=5e-5)
