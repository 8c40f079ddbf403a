"""Benchmark: N=10k NNGP Gram build + Cholesky wall-clock (BASELINE.md north star).

Measures the fused TPU path (one jitted computation: full MLP depth recursion
-> Gram -> jittered Cholesky). ``vs_baseline`` compares against *layerwise
self-execution*: the same math with per-layer jit boundaries + a separate
factorization call — the structure a naive port of the reference's
neural_tangents/objax pipeline produces. The reference stack itself cannot run
here (no neural_tangents/objax/GPU), so this is an architectural baseline, not
a cross-framework one.

Also emits per-phase splits (Gram-only, Cholesky-only, blocked-Cholesky) so
round-over-round progress on each phase is visible, and — on TPU — runs a
non-interpret parity gate: all four fused Pallas Gram kernels vs the plain-jnp
reference tier at 1e-5 relative error (set SNNGP_BENCH_PARITY=0 to skip).

Prints ONE JSON line:
    {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup, ...}
"""

import json
import os
import time

import jax
import jax.numpy as jnp

from snngp.nn import arch
from snngp.nn.layers import Dense, Relu
from snngp.ops.linalg import add_jitter, sym_t

N = 10_000
D = 16
DEPTH = 4
EPS = 1e-6


def _fetch(out):
    # Force full execution: device-side reduce + 4-byte host fetch.
    # (block_until_ready alone can be a no-op through remote-device tunnels.)
    return float(jnp.sum(out))


def _time(fn, *args, iters=3):
    out = fn(*args)
    _fetch(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def _rel_err(a, b):
    return float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))


def _device_time(build, x, iters=8):
    """Device-only seconds per evaluation of ``build(x) -> scalar``.

    The remote-device tunnel adds ~27 ms of fixed dispatch+fetch latency to
    every wall-clock timing (RESULTS.md round 2), swamping kernel-level
    progress. This amortizes it away: run the op n times inside ONE jitted
    ``fori_loop`` (n is a traced argument — one compile) with a per-iteration
    input perturbation defeating CSE, and report
    (wall(n) - wall(1)) / (n - 1)."""
    from jax import lax

    @jax.jit
    def run(x, n):
        def body(i, acc):
            return acc + build(x * (1.0 + 1e-6 * i))
        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    def wall(n):
        float(run(x, n))                       # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tn = wall(1), wall(iters)
    return max(tn - t1, 0.0) / (iters - 1)


def _north_star_kernels():
    """Device-true kernel metrics at north-star configuration (VERDICT r3
    weak #1: the N=10k headline saturated three rounds ago; the real
    round-over-round progress lives in these two numbers).

    * ``myrtle32_us_per_pair``: fused Pallas Myrtle-5 Gram at CIFAR
      resolution (32x32), one [512, 512] dispatch block — the unit of work
      the 50k x 50k north-star assembly repeats 4,851 times
      (``spax/kernels.py:23-27`` is the reference compute site).
    * ``cholesky_n50000_s``: ``inplace_blocked_cholesky`` of a full
      50,000^2 fp32 Gram on ONE chip (donated buffer — the only
      factorization that fits 10 GB on a 16 GB device), with a logdet
      sanity gate against the exact float64 value of the low-rank-plus-
      identity test matrix (matrix determinant lemma).
    """
    import numpy as np

    from snngp.ops.pallas.myrtle_gram import myrtle_gram
    from snngp.parallel.cholesky import inplace_blocked_cholesky

    out = {}
    key = jax.random.PRNGKey(11)

    # --- fused Myrtle 32x32, one 512^2 block ---
    b = 512
    xa = jax.random.uniform(key, (b, 32, 32, 3), dtype=jnp.float32)
    xb = jax.random.uniform(jax.random.PRNGKey(12), (b, 32, 32, 3),
                            dtype=jnp.float32)
    blk = jax.jit(lambda p, q: myrtle_gram(p, q, depth=5, act="relu",
                                           w_std=1.0, b_std=0.1,
                                           last_w_std=1.0))
    np.asarray(blk(xa, xb))                                    # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(blk(xa, xb))
        best = min(best, time.perf_counter() - t0)
    out["myrtle32_us_per_pair"] = round(best / (b * b) * 1e6, 3)

    # --- N=50,000 in-place Cholesky (the north-star factorization) ---
    n, d = 50_000, 64
    x = jax.random.normal(key, (n, d), dtype=jnp.float32) / np.sqrt(d)
    xh = np.asarray(x, np.float64)
    _, logdet_exact = np.linalg.slogdet(np.eye(d) + xh.T @ xh)

    build = jax.jit(lambda x: x @ x.T)
    factor = jax.jit(
        lambda k: inplace_blocked_cholesky(
            k + jnp.eye(n, dtype=jnp.float32)), donate_argnums=0)
    best, logdet = float("inf"), None
    for _ in range(2):
        k = build(x)
        k.block_until_ready()
        t0 = time.perf_counter()
        u = factor(k)
        diag = np.asarray(jnp.diagonal(u))   # [n] fetch forces completion
        best = min(best, time.perf_counter() - t0)
        del u, k
        logdet = 2.0 * float(np.sum(np.log(diag.astype(np.float64))))
    rel = abs(logdet - logdet_exact) / max(abs(logdet_exact), 1.0)
    assert rel < 1e-3, (
        f"N=50k factor logdet {logdet:.6f} vs exact f64 {logdet_exact:.6f} "
        f"(rel {rel:.2e})")
    out["cholesky_n50000_s"] = round(best, 3)
    out["cholesky_n50000_logdet_rel_err"] = float(f"{rel:.2e}")
    return out


def _training_metrics():
    """Training-side driver metrics (VERDICT r4 next #6: the headline is
    kernel-side only; ML-II and classification progress were invisible).

    * ``mlii_s_per_step_n1024``: ONE exact full-Gram tiled ML-II step at
      N=1024 (Myrtle-5 16x16, Student-t marginal, all six hyperparameters)
      through the fused augmented kernel with the per-block profile cache —
      augmented assembly + in-place factorization + streamed S^-1 panel
      contractions (``snngp/models/mlii.py``; the reference objective is
      ``experiments/regression/train.py:61-67``). Steady-state (2nd step).
    * pinned numbers from PINNED_RESULTS.json (design-scale runs measured on
      this chip are hours, not bench-budget; the file records what ran and
      when — see RESULTS.md for the full tables).
    """
    import numpy as np

    from snngp.models.mlii import (full_gram_mlii_value_and_grad,
                                   tiled_aug_gram)
    from snngp.ops.pallas.myrtle_gram import (myrtle_gram_scale_grads,
                                              myrtle_profile_tangents)

    out = {}
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1024, 16, 16, 3), jnp.float32)
    y = np.asarray(rng.randn(1024), np.float32)
    hp = dict(depth=5, act="relu", w_std=1.0, b_std=0.1)

    def aug(a, b, profiles=None):
        return myrtle_gram_scale_grads(a, b, last_w_std=1.0, profiles=profiles,
                                       **hp)

    def prof_fn(xb):
        return myrtle_profile_tangents(xb, **hp)

    def step():
        k, dkw, dkb = tiled_aug_gram(aug, x, block=512, profile_fn=prof_fn)
        return full_gram_mlii_value_and_grad(
            k, dkw, dkb, y, last_w_std=1.0, eps=1e-4, ab=(2.0, 2.0),
            panel=1024)

    step()                                                     # compile
    t0 = time.perf_counter()
    loss, grads = step()
    out["mlii_s_per_step_n1024"] = round(time.perf_counter() - t0, 3)
    assert np.isfinite(loss) and all(np.isfinite(v) for v in grads.values())

    pin_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "PINNED_RESULTS.json")
    if os.path.exists(pin_path):
        with open(pin_path) as f:
            out["pinned"] = json.load(f)
    return out


def _pallas_parity():
    """On-TPU (non-interpret) fused-vs-reference parity for all four Pallas
    Gram kernels at 1e-5 relative error (VERDICT r1 weak #4). Returns the
    max relative error observed."""
    from snngp.ops.pallas.gram import mlp_gram, resnet_gram, _reference_recursion
    from snngp.ops.pallas.conv_gram import cnn_gram, _reference_cnn
    from snngp.ops.pallas.resnet_conv_gram import (conv_resnet_gram,
                                                   _reference_conv_resnet)

    key = jax.random.PRNGKey(7)
    hp = dict(w_std=1.3, b_std=0.3, last_w_std=1.1)
    worst = 0.0

    xv = jax.random.normal(key, (256, 24), dtype=jnp.float32)
    for name, fused, ref in (
        ("mlp", lambda a, b: mlp_gram(a, b, depth=3, act="relu", **hp),
         lambda a, b: _reference_recursion(a, b, 3, "relu", *hp.values())),
        ("dense-resnet", lambda a, b: resnet_gram(a, b, depth=3, act="relu", **hp),
         lambda a, b: _reference_recursion(a, b, 3, "relu", *hp.values(),
                                           mode="resnet")),
    ):
        got = jax.jit(fused)(xv, xv)
        want = jax.jit(ref)(xv, xv)
        err = _rel_err(got, want)
        worst = max(worst, err)
        assert err < 1e-5, f"pallas {name} parity: rel err {err}"

    xi = jax.random.normal(key, (128, 8, 8, 3), dtype=jnp.float32)
    got = jax.jit(lambda a, b: cnn_gram(a, b, depth=3, act="relu", **hp))(xi, xi)
    want = jax.jit(lambda a, b: _reference_cnn(a, b, 3, "relu", *hp.values()))(xi, xi)
    err = _rel_err(got, want)
    worst = max(worst, err)
    assert err < 1e-5, f"pallas cnn parity: rel err {err}"

    # CIFAR-resolution narrow-tile layout (hw = 1024).
    xc = jax.random.normal(key, (96, 32, 32, 3), dtype=jnp.float32)
    got = jax.jit(lambda a, b: cnn_gram(a, b, depth=3, act="relu", **hp))(xc, xc)
    want = jax.jit(lambda a, b: _reference_cnn(a, b, 3, "relu", *hp.values()))(xc, xc)
    err = _rel_err(got, want)
    worst = max(worst, err)
    assert err < 1e-5, f"pallas cnn 32x32 parity: rel err {err}"

    got = jax.jit(lambda a, b: conv_resnet_gram(
        a, b, depth=2, num_class=1, act="relu", **hp))(xi, xi)
    want = jax.jit(lambda a, b: _reference_conv_resnet(
        a, b, 2, 1, "relu", *hp.values()))(xi, xi)
    err = _rel_err(got, want)
    worst = max(worst, err)
    assert err < 1e-5, f"pallas conv-resnet parity: rel err {err}"
    return worst


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, D), dtype=jnp.float32)

    kernel_fn = arch.get_mlp_kernel(DEPTH, 1, "relu", w_std=1.3, b_std=0.3,
                                    last_w_std=1.0)

    @jax.jit
    def fused(x):
        # sym_t: the matmul-produced Gram is laid out column-major, the
        # Cholesky expansion wants row-major — the free symmetric transpose
        # cancels the [N, N] layout copy XLA otherwise inserts between them
        # (this was the BENCH_r03 fused_dev_s > gram_dev_s + cholesky_dev_s
        # inconsistency: ~3 ms of pure layout traffic).
        k = kernel_fn(x, x, get="nngp")
        return jnp.linalg.cholesky(add_jitter(sym_t(k), EPS))

    fused_s, chol = _time(fused, x)

    # Phase splits (round-over-round visibility per VERDICT r1 item 9).
    gram_jit = jax.jit(lambda x: kernel_fn(x, x, get="nngp"))
    gram_s, k10 = _time(gram_jit, x)
    chol_jit = jax.jit(lambda k: jnp.linalg.cholesky(add_jitter(k, EPS)))
    chol_s, _ = _time(chol_jit, k10)
    from snngp.parallel.cholesky import blocked_cholesky
    bchol_jit = jax.jit(lambda k: blocked_cholesky(add_jitter(k, EPS), block=1024))
    bchol_s, _ = _time(bchol_jit, k10)

    # Layerwise self-execution baseline: per-layer jit boundaries (each
    # layer's [N, N] state round-trips through HBM as a separate XLA
    # computation) + separate Cholesky call — the monolithic structure of
    # spax/kernels.py:23-27. NOT a measurement of the reference stack itself.
    from snngp.nn.state import input_state
    stack = []
    for _ in range(DEPTH):
        stack.append(Dense(512, w_std=1.3, b_std=0.3))
        stack.append(Relu())
    stack.append(Dense(1, w_std=1.0))
    layer_fns = [jax.jit(l.kfn) for l in stack]

    def unfused(x):
        st = input_state(x, None)
        for f in layer_fns:
            st = f(st)
        return chol_jit(st.nngp)

    unfused_s, chol_ref = _time(unfused, x, iters=2)

    err = _rel_err(chol, chol_ref)
    assert err < 1e-4, f"fused/unfused mismatch: rel err {err}"

    # Device-only attribution (VERDICT r2 Next #8): amortize the fixed
    # tunnel dispatch latency out of each phase so round-over-round kernel
    # progress is visible above the ~27 ms noise floor.
    gram_dev = _device_time(lambda xi: jnp.sum(kernel_fn(xi, xi, get="nngp")), x)
    chol_dev = _device_time(
        lambda ki: jnp.sum(jnp.diagonal(jnp.linalg.cholesky(add_jitter(ki, EPS)))),
        k10)
    fused_dev = _device_time(
        lambda xi: jnp.sum(jnp.diagonal(jnp.linalg.cholesky(
            add_jitter(sym_t(kernel_fn(xi, xi, get="nngp")), EPS)))), x)
    tunnel_overhead = max(fused_s - fused_dev, 0.0)

    parity = None
    if (os.environ.get("SNNGP_BENCH_PARITY", "1") != "0"
            and jax.default_backend() not in ("cpu",)):
        parity = _pallas_parity()

    kernel_metrics = None
    training_metrics = None
    if (os.environ.get("SNNGP_BENCH_HEAVY", "1") != "0"
            and jax.default_backend() not in ("cpu",)):
        kernel_metrics = _north_star_kernels()
        training_metrics = _training_metrics()

    result = {
        "metric": f"N={N} MLP-NNGP (depth {DEPTH}) Gram build + Cholesky wall-clock",
        "value": round(fused_s, 4),
        "unit": "s",
        "vs_baseline": round(unfused_s / fused_s, 3),
        "baseline_note": "vs layerwise self-execution (per-layer jit), not the reference stack",
        "splits": {
            "gram_s": round(gram_s, 4),
            "cholesky_xla_s": round(chol_s, 4),
            "cholesky_blocked_s": round(bchol_s, 4),
            "layerwise_total_s": round(unfused_s, 4),
        },
        "device_splits": {
            "gram_dev_s": round(gram_dev, 4),
            "cholesky_xla_dev_s": round(chol_dev, 4),
            "fused_dev_s": round(fused_dev, 4),
            "tunnel_overhead_s": round(tunnel_overhead, 4),
        },
    }
    if parity is not None:
        result["pallas_parity_max_rel_err"] = float(f"{parity:.2e}")
    if kernel_metrics is not None:
        result["north_star_kernels"] = kernel_metrics
    if training_metrics is not None:
        result["training_metrics"] = training_metrics
    print(json.dumps(result))


if __name__ == "__main__":
    main()
