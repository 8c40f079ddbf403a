"""Training-substrate tests: objax-exact Adam, SGD, plateau scheduler,
DataLoader reshuffle semantics, checkpoint round-trip + suffix restore."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from snngp.utils import (
    Adam, SGD, name_mask, DataLoader, ReduceLROnPlateau, Checkpointer,
    save_params, load_named,
)
from snngp.models.params import get_by_suffix


def test_adam_matches_objax_formula():
    """One manual objax-Adam step (SURVEY C14/X3 parity requirement)."""
    p0, g = 2.0, 0.5
    lr, b1, b2, eps = 0.1, 0.9, 0.999, 1e-8
    params = {"p": jnp.array(p0)}
    opt = Adam()
    state = opt.init(params)
    new, state = opt.update({"p": jnp.array(g)}, state, params, lr)

    m = (1 - b1) * g
    v = (1 - b2) * g * g
    lr_t = lr * np.sqrt(1 - b2) / (1 - b1)
    expect = p0 - lr_t * m / (np.sqrt(v) + eps)
    np.testing.assert_allclose(float(new["p"]), expect, rtol=1e-6)

    # second step
    new2, state = opt.update({"p": jnp.array(g)}, state, new, lr)
    m2 = m + (1 - b1) * (g - m)
    v2 = v + (1 - b2) * (g * g - v)
    lr_t2 = lr * np.sqrt(1 - b2 ** 2) / (1 - b1 ** 2)
    expect2 = expect - lr_t2 * m2 / (np.sqrt(v2) + eps)
    np.testing.assert_allclose(float(new2["p"]), expect2, rtol=1e-6)


def test_sgd_and_mask():
    params = {"a": jnp.array(1.0), "frozen": {"last_w_std": jnp.array(5.0)}}
    mask = name_mask(params, lambda n: "last_w_std" not in n)
    opt = SGD(mask=mask)
    state = opt.init(params)
    grads = {"a": jnp.array(1.0), "frozen": {"last_w_std": jnp.array(1.0)}}
    new, _ = opt.update(grads, state, params, 0.5)
    assert float(new["a"]) == 0.5
    assert float(new["frozen"]["last_w_std"]) == 5.0


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2)
    assert not s.step(1.0)
    for _ in range(2):
        assert not s.step(1.0)  # bad epochs 1, 2
    assert s.step(1.0)  # bad epoch 3 > patience -> reduce
    assert s.lr == 0.5


def test_dataloader_shuffle_reproducible():
    x = np.arange(10)[:, None]
    y = np.arange(10)
    dl1 = DataLoader(x, y, batch_size=4, shuffle=True, seed=3)
    dl2 = DataLoader(x, y, batch_size=4, shuffle=True, seed=3)
    b1 = [yb.tolist() for _, yb in dl1]
    b2 = [yb.tolist() for _, yb in dl2]
    assert b1 == b2
    b1b = [yb.tolist() for _, yb in dl1]  # epoch 2 reshuffles
    assert b1 != b1b
    assert sorted(sum(b1, [])) == list(range(10))


def test_checkpoint_roundtrip_and_suffix(tmp_path):
    params = {"kernel": {"w_std": jnp.array(1.5), "b_std": jnp.array(0.2)},
              "eps": jnp.array(1e-4)}
    path = os.path.join(tmp_path, "000.npz")
    save_params(path, params)
    named = load_named(path)
    assert set(named) == {"eps", "kernel.b_std", "kernel.w_std"}
    np.testing.assert_allclose(get_by_suffix(named, "w_std"), 1.5)
    np.testing.assert_allclose(get_by_suffix(named, "eps"), 1e-4)


def test_checkpointer_best_gating(tmp_path):
    ck = Checkpointer(str(tmp_path), keep_ckpts=2)
    params = {"p": jnp.array(0.0)}
    assert ck.step(0, 1.0, params)
    assert not ck.step(1, 2.0, params)   # worse -> no save
    assert ck.step(2, 0.5, params)
    assert ck.step(3, 0.25, params)
    files = sorted(os.listdir(tmp_path))
    assert files == ["002.npz", "003.npz"]  # pruned to keep_ckpts


def test_scan_chunked_training_matches_looped():
    """reg tr --scan-chunk runs identical math to the per-step loop."""
    from snngp.models import SPR, NNGPKernel, GaussianLikelihood
    from snngp.nn import arch

    rng = np.random.RandomState(0)
    x = rng.randn(20, 3).astype(np.float32)
    y = rng.randn(20).astype(np.float32)

    def gkf(w, b, l):
        return arch.get_mlp_kernel(2, act="relu", w_std=w, b_std=b, last_w_std=l)

    model = SPR(NNGPKernel(gkf, 1.0, 0.5, 1.0), GaussianLikelihood(),
                x, y, jnp.array(0.0), jnp.array(1.0), eps=1e-2)
    opt = Adam()

    def looped(params, opt_state, n):
        for _ in range(n):
            loss, grads = jax.value_and_grad(model.loss)(params)
            params, opt_state = opt.update(grads, opt_state, params, 1e-2)
        return params

    @jax.jit
    def chunked(params, opt_state, n=10):
        def body(carry, _):
            p, o = carry
            loss, grads = jax.value_and_grad(model.loss)(p)
            p, o = opt.update(grads, o, p, 1e-2)
            return (p, o), loss
        (params, opt_state), _ = jax.lax.scan(body, (params, opt_state),
                                              None, length=n)
        return params

    p0 = model.init_params()
    s0 = opt.init(p0)
    pl_ = looped(p0, s0, 10)
    pc = chunked(p0, s0)
    for a, b in zip(jax.tree_util.tree_leaves(pl_), jax.tree_util.tree_leaves(pc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_profiler_phases_and_report():
    from snngp.utils.profiling import Profiler
    prof = Profiler()
    with prof.phase("a"):
        prof.observe(jnp.ones((4, 4)) * 2)
    with prof.phase("a"):
        prof.observe(jnp.zeros(3))
    with prof.phase("b"):
        pass
    rep = prof.report()
    assert "a" in rep and "b" in rep
    assert prof.counts["a"] == 2 and prof.totals["a"] > 0
