"""Distributed tests on the emulated 8-device CPU mesh: sharded Gram and
blocked/distributed Cholesky equal their single-device references."""

import pytest
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


def test_blocked_cholesky_panel_inverse_matches_lapack():
    """MAGMA-style trtri+gemm panel: same factor as the trsm path (jittered
    PSD input; odd size exercises the identity-padding with the inverse)."""
    for n, b in [(256, 64), (200, 64)]:
        a = _psd(n, seed=7)
        got = blocked_cholesky(a, block=b, panel_inverse=True)
        expect = jnp.linalg.cholesky(a)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                   atol=2e-4)


def test_blocked_cholesky_single_block():
    a = _psd(64, seed=2)
    np.testing.assert_allclose(np.asarray(blocked_cholesky(a, block=64)),
                               np.asarray(jnp.linalg.cholesky(a)), atol=1e-5)


@pytest.mark.slow
def test_distributed_cholesky_on_mesh():
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    mesh = get_mesh(8)
    a = _psd(512, seed=3)
    got = distributed_cholesky(a, mesh, block=64)
    expect = jnp.linalg.cholesky(a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-4)


@pytest.mark.slow
def test_cyclic_cholesky_matches_lapack():
    from snngp.parallel.cholesky import cyclic_cholesky
    mesh = get_mesh(8)
    a = _psd(512, seed=7)
    got = cyclic_cholesky(a, mesh, block=32)
    expect = jnp.linalg.cholesky(a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-4)


@pytest.mark.slow
def test_cyclic_cholesky_padding_and_strategy():
    from snngp.parallel.cholesky import cyclic_cholesky
    mesh = get_mesh(8)
    a = _psd(200, seed=8)  # pads 200 -> 256 (block 32 x 8 devices)
    got = distributed_cholesky(a, mesh, block=32, strategy="cyclic")
    expect = jnp.linalg.cholesky(a)
    assert got.shape == (200, 200)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-4)


@pytest.mark.slow
def test_cyclic_cholesky_size_block_fuzz():
    """Odd sizes and block choices: padding + cyclic deal stay exact."""
    from snngp.parallel.cholesky import cyclic_cholesky
    mesh = get_mesh(8)
    for n0, blk, seed in [(96, 16, 11), (130, 16, 12), (257, 32, 13)]:
        a = _psd(n0, seed=seed)
        got = cyclic_cholesky(a, mesh, block=blk)
        expect = jnp.linalg.cholesky(a)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                   atol=2e-4, err_msg=f"n0={n0} blk={blk}")


def test_cyclic_cholesky_gradients():
    """d logdet / d scale through the cyclic factorization matches the
    monolithic op (chol_fn feeds training NLLs, so AD must survive the
    select-masked panel broadcast)."""
    from snngp.parallel.cholesky import cyclic_cholesky
    from snngp.ops.linalg import chol_logdet
    mesh = get_mesh(8)
    base = _psd(128, seed=9)

    def ld_cyc(s):
        return chol_logdet(cyclic_cholesky(s * base, mesh, block=16))

    def ld_ref(s):
        return chol_logdet(jnp.linalg.cholesky(s * base))

    # reverse-mode over shard_map requires an enclosing jit (eager grad hits
    # a sharding-override assert in current JAX); training steps are jitted.
    g1 = jax.jit(jax.grad(ld_cyc))(1.3)
    g2 = jax.grad(ld_ref)(1.3)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)


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


@pytest.mark.slow
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


@pytest.mark.slow
def test_2d_mesh_gram_matches_dense():
    """get_mesh(shape=(2,4)) + block-2D sharded_gram == dense Gram (VERDICT r1
    item 8 / SURVEY.md D1-D2)."""
    mesh = get_mesh(shape=(2, 4))
    assert mesh.axis_names == ("rows", "cols") and mesh.devices.shape == (2, 4)
    x = jax.random.normal(jax.random.PRNGKey(5), (32, 5))
    kfn = arch.get_mlp_kernel(2, 1, "relu", w_std=1.2, b_std=0.2, last_w_std=1.0)
    got = sharded_gram(kfn, x, mesh)
    expect = kfn(x, x, get="nngp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)
    # cross-Gram with different row/col counts
    x2 = jax.random.normal(jax.random.PRNGKey(6), (16, 5))
    got = sharded_gram(kfn, x, mesh, x2=x2)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(kfn(x, x2, get="nngp")), atol=1e-5)


def test_init_distributed_single_process_noop():
    from snngp.parallel.mesh import init_distributed
    assert init_distributed() is False  # no coordinator configured: no-op


@pytest.mark.slow
def test_mesh_sharded_predictive_parity():
    """gp_predict / SPR.test_nll with the distributed blocked chol_fn on an
    8-device mesh equals the monolithic jnp.linalg.cholesky path (VERDICT r1
    item 2: the predictive must scale past one chip)."""
    from snngp.models import SPR, NNGPKernel, StudentTLikelihood
    from snngp.ops.linalg import gp_predict

    mesh = get_mesh(8)
    rng = np.random.RandomState(7)
    x = rng.randn(64, 4).astype(np.float32)
    y = rng.randn(64).astype(np.float32)
    xt = rng.randn(16, 4).astype(np.float32)
    kfn = arch.get_mlp_kernel(2, 1, "relu", w_std=1.1, b_std=0.4, last_w_std=1.0)

    def dist_chol(a):
        return distributed_cholesky(a, mesh, block=16)

    m1, c1 = gp_predict(kfn, x, y[:, None], xt, diag_reg=3e-2)
    m2, c2 = gp_predict(kfn, x, y[:, None], xt, diag_reg=3e-2, chol_fn=dist_chol)
    # fp32 reassociation through a different factorization order on an NNGP
    # Gram: a few 1e-5 once conditioned (measured 3e-5 worst case).
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-4)

    def get_kernel_fn(w, b, l):
        return arch.get_mlp_kernel(2, act="relu", w_std=w, b_std=b, last_w_std=l)

    def build(mesh_):
        kernel = NNGPKernel(get_kernel_fn, 1.0, 0.5, 1.0)
        lik = StudentTLikelihood(2.0, 2.0)
        return SPR(kernel, lik, x, y, jnp.array(0.0), jnp.array(1.0),
                   eps=3e-2, mesh=mesh_, chol_block=16)

    single, dist = build(None), build(mesh)
    assert dist.chol_fn is not None  # predictive path wired to the mesh
    p = single.init_params()
    yt = rng.randn(16).astype(np.float32)
    n1 = float(jax.jit(single.test_nll)(p, xt, yt))
    n2 = float(jax.jit(dist.test_nll)(p, xt, yt))
    np.testing.assert_allclose(n1, n2, rtol=1e-4)


@pytest.mark.slow
def test_svsp_chol_fn_parity():
    """SVSP with a blocked chol_fn matches the default solve path (VERDICT r1
    item 2: SVSP's _posterior_pieces must accept a distributed factorization)."""
    from snngp.models import SVSP, NNGPKernel, InverseGammaPrior

    rng = np.random.RandomState(9)
    z = rng.randn(16, 5).astype(np.float32)
    xb = rng.randn(24, 5).astype(np.float32)
    yb = rng.randint(3, size=24)

    def gkf(w, b, l):
        return arch.get_mlp_kernel(2, 3, "relu", w_std=w, b_std=b, last_w_std=l)

    def build(**kw):
        return SVSP(InverseGammaPrior(2.0, 2.0), NNGPKernel(gkf, 1.0, 0.3, 1.0),
                    z, num_latent_gps=3, eps=1e-4, **kw)

    base = build()
    blocked = build(chol_fn=lambda a: blocked_cholesky(a, block=8))
    meshed = build(mesh=get_mesh(8), chol_block=8)
    assert meshed.chol_fn is not None
    p = base.init_params()
    key = jax.random.PRNGKey(0)
    l0 = float(base.loss(p, key, xb, yb, 100, 4))
    for m in (blocked, meshed):
        np.testing.assert_allclose(float(m.loss(p, key, xb, yb, 100, 4)), l0,
                                   rtol=1e-5)
    n0, c0 = base.test_acc_nll(p, key, xb, yb, 8)
    n1, c1 = blocked.test_acc_nll(p, key, xb, yb, 8)
    np.testing.assert_allclose(float(n0), float(n1), rtol=1e-5)
    assert int(c0) == int(c1)


@pytest.mark.slow
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


def test_spr_mesh_pads_non_divisible_n():
    """N=61 on an 8-device mesh: the sharded Gram pads rows to the mesh
    multiple and slices back (no silent unsharded fallback), matching the
    single-device loss."""
    from snngp.models import SPR, NNGPKernel, StudentTLikelihood
    rng = np.random.RandomState(12)
    x = rng.randn(61, 4).astype(np.float32)
    y = rng.randn(61).astype(np.float32)

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


def test_inplace_blocked_cholesky_upper_factor():
    """fori-loop in-place kernel returns the UPPER factor U = L^T with the
    strict lower triangle zeroed (memory-lean contract: factors north-star
    Grams inside their own donated buffer; RESULTS.md round 3)."""
    from snngp.parallel.cholesky import inplace_blocked_cholesky
    for n, b in [(256, 64), (300, 64), (192, 128), (64, 64), (512, None)]:
        a = _psd(n, seed=3)
        want = np.asarray(jnp.linalg.cholesky(a)).T
        got = np.asarray(inplace_blocked_cholesky(a, block=b))  # donates a
        assert np.allclose(got, np.triu(got)), "lower triangle not zeroed"
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_inplace_blocked_cholesky_solves_and_logdet():
    """Upper-factor consumption pattern used by the serving/predictive
    paths: cho_solve((u, False)) and 2*sum(log(diag(u)))."""
    from jax.scipy.linalg import cho_solve
    from snngp.parallel.cholesky import inplace_blocked_cholesky
    a = _psd(256, seed=4)
    y = jnp.asarray(np.random.RandomState(0).randn(256, 3).astype(np.float32))
    want = jnp.linalg.solve(a, y)
    _, want_ld = jnp.linalg.slogdet(a)
    u = inplace_blocked_cholesky(a, block=64)  # donates a
    np.testing.assert_allclose(np.asarray(cho_solve((u, False), y)),
                               np.asarray(want), atol=2e-3)
    ld = 2 * jnp.sum(jnp.log(jnp.diagonal(u)))
    np.testing.assert_allclose(float(ld), float(want_ld), rtol=1e-5)


def test_inplace_blocked_cholesky_fuzz_sizes():
    """Random sizes x blocks (incl. non-multiples and block > n)."""
    from snngp.parallel.cholesky import inplace_blocked_cholesky
    rng = np.random.RandomState(9)
    for _ in range(8):
        n = int(rng.randint(33, 320))
        b = int(rng.choice([16, 48, 64, 100, 512]))
        a = _psd(n, seed=int(rng.randint(1000)))
        want = np.asarray(jnp.linalg.cholesky(a)).T
        got = np.asarray(inplace_blocked_cholesky(a, block=b))
        np.testing.assert_allclose(got, want, atol=3e-4,
                                   err_msg=f"n={n} block={b}")


def test_inplace_blocked_cholesky_inside_jit_with_donation():
    """The north-star composition (examples/cifar_myrtle.py): jitter + the
    in-place factorization inside ONE enclosing donating jit, upper-factor
    predictive solves outside."""
    from jax.scipy.linalg import cho_solve
    from snngp.ops.linalg import add_jitter
    from snngp.parallel.cholesky import inplace_blocked_cholesky

    a = _psd(192, seed=12, jitter=0.0)
    y = jnp.asarray(np.random.RandomState(1).randn(192).astype(np.float32))
    want = jnp.linalg.solve(a + 1e-2 * jnp.eye(192), y)

    @jax.jit
    def chol_kernel(k):
        return inplace_blocked_cholesky(add_jitter(k, 1e-2), block=64)

    # donate at the outer boundary, like the example does
    u = jax.jit(chol_kernel.__wrapped__, donate_argnums=0)(a)
    got = cho_solve((u, False), y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_blocked_triangular_solve_parity():
    """Memory-lean panel solve vs jax.scipy solve_triangular, both
    directions, multi-RHS, 1-D RHS, ragged sizes with auto divisor blocks
    (the kernel the north-star predictive runs against the in-place
    factor: XLA's monolithic solve needs ~3x the factor in HLO temps and
    OOMs a 16 GB chip at N=32768)."""
    from jax.scipy.linalg import solve_triangular
    from snngp.parallel.cholesky import blocked_triangular_solve
    rng = np.random.RandomState(11)
    for n, blk in [(64, 16), (96, None), (100, None), (50, 16), (33, None)]:
        a = _psd(n, seed=n)
        u = np.triu(np.asarray(jnp.linalg.cholesky(a)).T)
        for r in (1, 4):
            b = rng.randn(n, r).astype(np.float32)
            for trans in (True, False):
                want = solve_triangular(jnp.asarray(u), jnp.asarray(b),
                                        lower=False, trans=1 if trans else 0)
                got = blocked_triangular_solve(
                    jnp.asarray(u), jnp.asarray(b), trans=trans, block=blk)
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4,
                    err_msg=f"n={n} blk={blk} r={r} trans={trans}")
        b1 = rng.randn(n).astype(np.float32)
        got1 = blocked_triangular_solve(jnp.asarray(u), jnp.asarray(b1),
                                        trans=True, block=blk)
        want1 = solve_triangular(jnp.asarray(u), jnp.asarray(b1),
                                 lower=False, trans=1)
        assert got1.shape == (n,)
        np.testing.assert_allclose(np.asarray(got1), np.asarray(want1),
                                   rtol=2e-4, atol=2e-4)


def test_inplace_factor_plus_blocked_solve_predictive():
    """The full memory-lean predictive composition from
    examples/cifar_myrtle.py: in-place upper factor -> forward solve for
    beta -> back solve for K^{-1}y -> cross-cov whitening, vs the dense
    reference (reference sites spax/models.py:100-120)."""
    from snngp.ops.linalg import add_jitter
    from snngp.parallel.cholesky import (blocked_triangular_solve,
                                         inplace_blocked_cholesky)
    n, m = 120, 7
    rng = np.random.RandomState(3)
    a = _psd(n, seed=8)
    k_td = jnp.asarray(rng.randn(m, n).astype(np.float32) * 0.1)
    k_tt = jnp.asarray(np.eye(m, dtype=np.float32))
    y = jnp.asarray(rng.randn(n).astype(np.float32))
    kj = add_jitter(a, 1e-4)
    want_mean = k_td @ jnp.linalg.solve(kj, y)
    want_cov = k_tt - k_td @ jnp.linalg.solve(kj, k_td.T)
    want_quad = y @ jnp.linalg.solve(kj, y)
    u = inplace_blocked_cholesky(add_jitter(a, 1e-4), block=40)
    beta = blocked_triangular_solve(u, y, trans=True, block=40)
    mean = k_td @ blocked_triangular_solve(u, beta, trans=False, block=40)
    v = blocked_triangular_solve(u, k_td.T, trans=True, block=40)
    cov = k_tt - v.T @ v
    np.testing.assert_allclose(np.asarray(mean), np.asarray(want_mean),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(want_cov),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(jnp.sum(beta * beta)),
                               float(want_quad), rtol=1e-3)
