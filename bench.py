"""Benchmark: N=10k NNGP Gram build + Cholesky wall-clock (BASELINE.md north star).

Measures the fused TPU path (one jitted computation: full MLP depth recursion
-> Gram -> jittered Cholesky) and compares against a reference-style unfused
execution (per-layer jit boundaries + separate factorization call, the
structure a naive port of the reference's neural_tangents/objax pipeline
produces). Prints ONE JSON line:
    {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}
"""

import json
import time

import jax
import jax.numpy as jnp

from snngp.nn import arch
from snngp.nn.layers import Dense, Relu
from snngp.ops.linalg import add_jitter

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


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, D), dtype=jnp.float32)

    kernel_fn = arch.get_mlp_kernel(DEPTH, 1, "relu", w_std=1.3, b_std=0.3,
                                    last_w_std=1.0)

    @jax.jit
    def fused(x):
        k = kernel_fn(x, x, get="nngp")
        return jnp.linalg.cholesky(add_jitter(k, EPS))

    fused_s, chol = _time(fused, x)

    # Reference-style baseline: per-layer jit boundaries (each layer's [N, N]
    # state round-trips through HBM as a separate XLA computation) + separate
    # Cholesky call — the monolithic structure of spax/kernels.py:23-27.
    from snngp.nn.state import input_state
    layer_fns = []
    stack = []
    for _ in range(DEPTH):
        stack.append(Dense(512, w_std=1.3, b_std=0.3))
        stack.append(Relu())
    stack.append(Dense(1, w_std=1.0))
    layer_fns = [jax.jit(l.kfn) for l in stack]
    chol_fn = jax.jit(lambda k: jnp.linalg.cholesky(add_jitter(k, EPS)))

    def unfused(x):
        st = input_state(x, None)
        for f in layer_fns:
            st = f(st)
        return chol_fn(st.nngp)

    unfused_s, chol_ref = _time(unfused, x, iters=2)

    err = float(jnp.max(jnp.abs(chol - chol_ref)))
    assert err < 1e-2, f"fused/unfused mismatch: {err}"

    print(json.dumps({
        "metric": f"N={N} MLP-NNGP (depth {DEPTH}) Gram build + Cholesky wall-clock",
        "value": round(fused_s, 4),
        "unit": "s",
        "vs_baseline": round(unfused_s / fused_s, 3),
    }))


if __name__ == "__main__":
    main()
