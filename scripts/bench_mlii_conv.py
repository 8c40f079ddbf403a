"""ML-II step timing at conv scale (VERDICT r2 Next #2 'done' criterion).

Times value_and_grad of a marginal-likelihood-shaped loss over the fused
conv Gram at hw=1024 (CIFAR 32x32) w.r.t. the three scale scalars:

- fused forward + scalar-tangent fused backward (trainable_inputs=False)
- fused forward + XLA reference-tier reverse backward (default)
- fused forward alone

Target: scalar-tangent backward <= ~4x the fused forward.

Usage: python scripts/bench_mlii_conv.py [--n 256] [--depth 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from snngp.ops.pallas.conv_gram import cnn_gram

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.n, 32, 32, 3), jnp.float32)
    y = jnp.asarray(rng.randn(args.n), jnp.float32)

    def loss(w, b, l, trainable_inputs):
        k = cnn_gram(x, x, depth=args.depth, act="relu", w_std=w, b_std=b,
                     last_w_std=l, trainable_inputs=trainable_inputs)
        chol = jnp.linalg.cholesky(k + 1e-2 * jnp.eye(args.n))
        a = jax.scipy.linalg.solve_triangular(chol, y, lower=True)
        return (jnp.sum(a * a)
                + 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))) / args.n

    fwd = jax.jit(lambda w, b, l: loss(w, b, l, False))
    vg_scalar = jax.jit(jax.value_and_grad(
        lambda w, b, l: loss(w, b, l, False), argnums=(0, 1, 2)))
    vg_ref = jax.jit(jax.value_and_grad(
        lambda w, b, l: loss(w, b, l, True), argnums=(0, 1, 2)))

    def timed(fn, label):
        t0 = time.time()
        out = fn(1.2, 0.3, 1.0)
        leaves = jax.tree_util.tree_leaves(out)
        _ = [float(v) for v in leaves]
        print(f"{label}: first (compile) {time.time() - t0:.1f}s", flush=True)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            out = fn(1.2, 0.3, 1.0)
            _ = [float(v) for v in jax.tree_util.tree_leaves(out)]
            ts.append(time.time() - t0)
        print(f"{label}: steady {min(ts):.3f}s", flush=True)
        return min(ts), out

    t_fwd, _ = timed(fwd, f"forward only (fused, N={args.n}, hw=1024)")
    t_sc, (v_sc, g_sc) = timed(vg_scalar, "value_and_grad scalar-tangent")
    t_rf, (v_rf, g_rf) = timed(vg_ref, "value_and_grad reference-tier bwd")

    for a, b in zip(g_sc, g_rf):
        rel = abs(float(a) - float(b)) / max(abs(float(b)), 1e-12)
        print(f"grad parity rel err: {rel:.2e}", flush=True)
    bwd_sc = t_sc - t_fwd
    bwd_rf = t_rf - t_fwd
    print(f"backward cost: scalar-tangent {bwd_sc:.3f}s "
          f"({bwd_sc / t_fwd:.1f}x fwd) vs reference-tier {bwd_rf:.3f}s "
          f"({bwd_rf / t_fwd:.1f}x fwd) -> {bwd_rf / max(bwd_sc, 1e-9):.1f}x "
          f"speedup", flush=True)


if __name__ == "__main__":
    main()
