"""Full-Gram tiled ML-II (snngp/models/mlii.py) vs jax.grad of SPR.loss.

The tiled closed-form gradient must equal the reference's differentiable
path — jax.grad through Gram build + factorization
(``experiments/regression/train.py:61-67`` via ``spax/models.py:93-98``) —
at sizes where both run. The MLP NNGP family (pure-jnp reference recursion)
keeps the kernel evaluation cheap on CPU; the machinery is kernel-agnostic
(the north-star pipeline plugs in the fused Myrtle augmented pass).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snngp.models import params as P
from snngp.models.bijectors import positive
from snngp.models.gp import SPR
from snngp.models.kernels import NNGPKernel
from snngp.models.likelihoods import GaussianLikelihood, StudentTLikelihood
from snngp.models.mlii import (full_gram_mlii_value_and_grad, mlii_fit_full,
                               tiled_aug_gram)
from snngp.ops.pallas.gram import _reference_recursion

DEPTH = 3
ACT = "relu"


def _builder(w, b, l):
    def kfn(a, c, get="nngp"):
        assert get == "nngp"
        return _reference_recursion(a, c, DEPTH, ACT, w, b, l)
    return kfn


def _aug_builder(w_std, b_std, last_w_std):
    """(k, dkw, dkb) tiles via forward-mode through the reference recursion
    — the CPU stand-in for the fused Myrtle augmented pass."""
    w = jnp.asarray(w_std, jnp.float32)
    b = jnp.asarray(b_std, jnp.float32)
    l = jnp.asarray(last_w_std, jnp.float32)

    @jax.jit
    def aug(x1, x2):
        f = lambda wv, bv: _reference_recursion(x1, x2, DEPTH, ACT, wv, bv, l)
        k = f(w, b)
        _, dkw = jax.jvp(lambda wv: f(wv, b), (w,), (jnp.ones_like(w),))
        _, dkb = jax.jvp(lambda bv: f(w, bv), (b,), (jnp.ones_like(b),))
        return k, dkw, dkb

    return aug


def _unconstrained_grads(g_c, params, ab):
    """Chain constrained-space scalar grads through the bijector, mirroring
    mlii_fit_full, to compare against jax.grad of SPR.loss."""
    bij = positive()

    def chain(raw, g):
        _, vjp = jax.vjp(bij, raw)
        return float(vjp(jnp.asarray(g, jnp.float32))[0])

    out = {k: chain(params["kernel"][k], g_c[k])
           for k in ("w_std", "b_std", "last_w_std")}
    out["eps"] = chain(params["eps"], g_c["eps"])
    if ab is not None:
        out["a"] = chain(params["likelihood"]["a"], g_c["a"])
        out["b"] = chain(params["likelihood"]["b"], g_c["b"])
    return out


HYPER = dict(w_std=1.3, b_std=0.4, last_w_std=0.9)
EPS0 = 3e-2
A0, B0 = 2.0, 1.5


def _data(n=96, d=6, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(n, d), jnp.float32),
            jnp.asarray(rng.randn(n), jnp.float32))


@pytest.mark.parametrize("method", ["gp", "tp"])
def test_full_gram_mlii_matches_dense_grad(method):
    x, y = _data()
    n = x.shape[0]
    kernel = NNGPKernel(_builder, **HYPER)
    lik = (StudentTLikelihood(A0, B0) if method == "tp"
           else GaussianLikelihood())
    model = SPR(kernel, lik, x, y, 0.0, 1.0, eps=EPS0)
    params = model.init_params()
    loss_want, g_want = jax.value_and_grad(model.loss)(params)

    aug = _aug_builder(**HYPER)
    k, dkw, dkb = tiled_aug_gram(aug, x, block=32)
    # Assembly parity: mirrored tiles must equal the dense Gram.
    k_dense = np.asarray(model._gram(kernel.get_kernel_fn(params["kernel"])))
    np.testing.assert_allclose(k, k_dense, rtol=2e-6, atol=1e-6)

    ab = (A0, B0) if method == "tp" else None
    loss_got, g_c = full_gram_mlii_value_and_grad(
        k, dkw, dkb, y, last_w_std=HYPER["last_w_std"], eps=EPS0, ab=ab,
        panel=40)  # non-dividing panel exercises the tail slice

    assert np.isclose(loss_got, float(loss_want), rtol=1e-5)
    g_got = _unconstrained_grads(g_c, params, ab)
    names = ["w_std", "b_std", "last_w_std", "eps"] + (
        ["a", "b"] if ab else [])
    for name in names:
        if name in ("a", "b"):
            want = float(g_want["likelihood"][name])
        elif name == "eps":
            want = float(g_want["eps"])
        else:
            want = float(g_want["kernel"][name])
        assert np.isclose(g_got[name], want, rtol=2e-3, atol=1e-6), (
            f"{method} d/d{name}: tiled {g_got[name]:.6g} vs dense {want:.6g}")


def test_mlii_fit_full_matches_dense_adam(tmp_path):
    """Two Adam steps through the tiled gradient == two Adam steps through
    jax.grad of SPR.loss (same optimizer implementation, same lr) — the
    end-to-end check that the full-Gram path IS the reference's reg-tr
    recipe at tiled scale. Also exercises resume: step 1 and step 2 run as
    separate invocations sharing a resume_dir."""
    from snngp.utils.optim import Adam

    x, y = _data(n=64)
    kernel = NNGPKernel(_builder, **HYPER)
    model = SPR(kernel, StudentTLikelihood(A0, B0), x, y, 0.0, 1.0, eps=EPS0)
    params = model.init_params()
    opt = Adam()
    opt_state = opt.init(params)
    lr = 5e-2
    for _ in range(2):
        grads = jax.grad(model.loss)(params)
        params, opt_state = opt.update(grads, opt_state, params, lr)
    want_w = float(P.constrained_read(params["kernel"]["w_std"], model.bij))
    want_eps = float(P.constrained_read(params["eps"], model.bij))
    want_a = float(P.constrained_read(params["likelihood"]["a"], model.bij))

    rdir = str(tmp_path / "mlii")
    quiet = lambda *_args, **_kw: None
    mlii_fit_full(_aug_builder, x, y, steps=1, lr=lr, block=32,
                  init_hyper=dict(HYPER), eps=EPS0, ab=(A0, B0),
                  panel=64, resume_dir=rdir, log=quiet)
    hyper, eps_f, ab_f, losses = mlii_fit_full(
        _aug_builder, x, y, steps=2, lr=lr, block=32,
        init_hyper=dict(HYPER), eps=EPS0, ab=(A0, B0),
        panel=64, resume_dir=rdir, log=quiet)
    assert len(losses) == 1            # resumed: only step 2 ran
    assert np.isclose(hyper["w_std"], want_w, rtol=1e-3)
    assert np.isclose(eps_f, want_eps, rtol=1e-3)
    assert np.isclose(ab_f[0], want_a, rtol=1e-3)


def test_tiled_aug_gram_profile_cache():
    """profile_fn is called once per BLOCK (not per tile) and the cached
    per-block precompute reaches aug_fn alongside the right block pair."""
    x, _ = _data()
    n, block = x.shape[0], 32
    ref = tiled_aug_gram(_aug_builder(**HYPER), x, block=block)

    calls = []

    def profile_fn(xb):
        calls.append(1)
        return np.asarray(xb).sum(axis=1)      # any per-block precompute

    aug0 = _aug_builder(**HYPER)

    def aug(x1, x2, profiles=None):
        p1, p2 = profiles
        np.testing.assert_allclose(p1, np.asarray(x1).sum(axis=1), rtol=1e-6)
        np.testing.assert_allclose(p2, np.asarray(x2).sum(axis=1), rtol=1e-6)
        return aug0(x1, x2)

    got = tiled_aug_gram(aug, x, block=block, profile_fn=profile_fn)
    assert len(calls) == -(-n // block)        # once per block, not per tile
    for a, b in zip(got, ref):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_tiled_aug_gram_resume(tmp_path):
    """A partially-assembled augmented Gram resumes from its bitmap and
    finishes identical to a fresh assembly."""
    x, _ = _data(n=64)
    aug = _aug_builder(**HYPER)
    rdir = str(tmp_path / "aug")
    k0, dkw0, dkb0 = tiled_aug_gram(aug, x, block=32)

    # Fresh resumable assembly, then clobber one tile's done bit + data.
    k1, _, _ = tiled_aug_gram(aug, x, block=32, resume_dir=rdir)
    done_path = f"{rdir}/aug.done.npy"
    done = np.load(done_path)
    done[1] = False
    np.save(done_path, done)
    kmap = np.lib.format.open_memmap(f"{rdir}/aug_k.npy", mode="r+")
    kmap[:32, 32:] = -1.0
    kmap.flush()
    del kmap

    k2, dkw2, dkb2 = tiled_aug_gram(aug, x, block=32, resume_dir=rdir)
    np.testing.assert_allclose(np.asarray(k2), k0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dkw2), dkw0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dkb2), dkb0, rtol=1e-6)
