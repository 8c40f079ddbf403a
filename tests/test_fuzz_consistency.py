"""Randomized cross-tier consistency: for random shapes/hyperparameters the
three execution tiers (reference jnp, Pallas-interpret, full-covariance) must
agree — the cheap invariant that guards every kernel rewrite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snngp.nn import arch
from snngp.nn import full as F
from snngp.nn.layers import kernel_fn_of


@pytest.mark.parametrize("seed", range(4))
def test_mlp_pallas_interpret_fuzz(seed):
    import snngp.ops.pallas.gram as G
    G.INTERPRET = True
    try:
        rng = np.random.RandomState(seed)
        n1 = int(rng.randint(3, 40))
        n2 = int(rng.randint(3, 40))
        d = int(rng.randint(2, 20))
        depth = int(rng.randint(1, 5))
        act = ["relu", "erf"][seed % 2]
        w, b, l = rng.uniform(0.3, 2.0, 3)
        x1 = jnp.asarray(rng.randn(n1, d), jnp.float32)
        x2 = jnp.asarray(rng.randn(n2, d), jnp.float32)
        K_p = G.mlp_gram(x1, x2, depth=depth, act=act, w_std=w, b_std=b,
                         last_w_std=l, tile=(8, 8))
        kfn = arch.get_mlp_kernel(depth, 1, act, w_std=w, b_std=b, last_w_std=l)
        np.testing.assert_allclose(np.asarray(K_p),
                                   np.asarray(kfn(x1, x2, get="nngp")),
                                   rtol=2e-5, atol=2e-6)
    finally:
        G.INTERPRET = False


@pytest.mark.parametrize("seed", range(3))
def test_cnn_pallas_interpret_fuzz(seed):
    import snngp.ops.pallas.conv_gram as CG
    CG.INTERPRET = True
    try:
        rng = np.random.RandomState(100 + seed)
        n1 = int(rng.randint(3, 16))
        n2 = int(rng.randint(3, 16))
        h = int(rng.randint(3, 9))
        w_ = int(rng.randint(3, 9))
        c = int(rng.randint(1, 4))
        depth = int(rng.randint(1, 4))
        act = ["relu", "erf"][seed % 2]
        w, b, l = rng.uniform(0.3, 1.8, 3)
        x1 = jnp.asarray(rng.randn(n1, h, w_, c), jnp.float32)
        x2 = jnp.asarray(rng.randn(n2, h, w_, c), jnp.float32)
        K_p = CG.cnn_gram(x1, x2, depth=depth, act=act, w_std=w, b_std=b,
                          last_w_std=l, tile=(8, 8))
        kfn = kernel_fn_of(arch.get_cnn_layer(depth, 1, act, w, b, l))
        np.testing.assert_allclose(np.asarray(K_p),
                                   np.asarray(kfn(x1, x2, get="nngp")),
                                   rtol=3e-5, atol=3e-6)
    finally:
        CG.INTERPRET = False


@pytest.mark.parametrize("seed", range(3))
def test_full_tier_vs_diag_tier_fuzz(seed):
    """Flatten-readout CNNs: full spatial tier must equal matched-pixel tier
    for random shapes/strides."""
    rng = np.random.RandomState(200 + seed)
    n = int(rng.randint(2, 6))
    h = int(rng.randint(4, 9))
    c = int(rng.randint(1, 3))
    w, b = rng.uniform(0.5, 1.5, 2)
    stride = int(rng.choice([1, 2]))
    x = jnp.asarray(rng.randn(n, h, h, c), jnp.float32)

    from snngp.nn import layers as L
    diag = L.serial(L.Conv(1, (3, 3), (stride, stride), "SAME", w_std=w, b_std=b),
                    L.Relu(),
                    L.Conv(1, (3, 3), (1, 1), "SAME", w_std=w, b_std=b),
                    L.Erf(), L.Flatten(), L.Dense(1, w_std=1.0))
    K_d = kernel_fn_of(diag)(x, None, get="nngp")

    fullk = F.serial_f(F.ConvF((3, 3), (stride, stride), w, b), F.ActF("relu"),
                       F.ConvF((3, 3), (1, 1), w, b), F.ActF("erf"),
                       F.FlattenF(), F.DenseF(1.0))
    K_f = F.full_kernel_fn(fullk)(x, x, get="nngp")
    np.testing.assert_allclose(np.asarray(K_f), np.asarray(K_d),
                               rtol=2e-5, atol=2e-6)
