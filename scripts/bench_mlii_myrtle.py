"""Myrtle ML-II step timing at the north-star shape (round 3).

Times value_and_grad of a marginal-likelihood-shaped loss over the fused
Myrtle Gram w.r.t. the three scale scalars, against the fused forward
alone. The scalar-tangent backward (``trainable_inputs=False``) is ONE
augmented fused pass carrying the (w_std, b_std) tangent states through
the whole pair recursion in VMEM; the default reference-tier reverse
backward materializes every layer of the [N, N, h, w, h, w] state in HBM
and OOMs long before north-star block sizes — it is only timed at the
small control size.

Usage: python scripts/bench_mlii_myrtle.py [--n 512] [--size 32] [--reps 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, args, reps):
    fn(*args)  # compile
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, out)
        # remote tunnels may not block: force a scalar fetch
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--ref-n", type=int, default=0,
                    help="also time the reference-tier backward at this "
                         "(small) N; 0 = skip")
    args = ap.parse_args()

    import snngp.ops.pallas.myrtle_gram as mg

    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.rand(args.n, args.size, args.size, 3), jnp.float32)
    x2 = jnp.asarray(rng.rand(args.n, args.size, args.size, 3), jnp.float32)
    g = jnp.asarray(rng.rand(args.n, args.n), jnp.float32)
    hp = (jnp.float32(1.3), jnp.float32(0.2), jnp.float32(1.1))

    def loss(w, b, l, trainable_inputs):
        return jnp.sum(g * mg.myrtle_gram(
            x1, x2, depth=args.depth, act="relu", w_std=w, b_std=b,
            last_w_std=l, trainable_inputs=trainable_inputs))

    fwd = jax.jit(lambda w, b, l: loss(w, b, l, False))
    vg_fused = jax.jit(jax.value_and_grad(
        lambda w, b, l: loss(w, b, l, False), argnums=(0, 1, 2)))

    t_f = timed(fwd, hp, args.reps)
    t_g = timed(lambda *a: vg_fused(*a)[0], hp, args.reps)
    pairs = args.n * args.n
    print(f"[{args.n}x{args.n} pairs @ {args.size}x{args.size} Myrtle-"
          f"{args.depth}]")
    print(f"fused forward:                  {t_f:.3f} s "
          f"({t_f / pairs * 1e6:.2f} us/pair)")
    print(f"value_and_grad (scalar-tangent):{t_g:.3f} s "
          f"(backward = {t_g - t_f:.3f} s = {(t_g - t_f) / t_f:.2f}x fwd)")

    if args.ref_n:
        n = args.ref_n
        x1s, x2s, gs = x1[:n], x2[:n], g[:n, :n]

        def loss_s(w, b, l, ti):
            return jnp.sum(gs * mg.myrtle_gram(
                x1s, x2s, depth=args.depth, act="relu", w_std=w, b_std=b,
                last_w_std=l, trainable_inputs=ti))

        vg_ref = jax.jit(jax.value_and_grad(
            lambda w, b, l: loss_s(w, b, l, True), argnums=(0, 1, 2)))
        vg_tan = jax.jit(jax.value_and_grad(
            lambda w, b, l: loss_s(w, b, l, False), argnums=(0, 1, 2)))
        t_ref = timed(lambda *a: vg_ref(*a)[0], hp, args.reps)
        t_tan = timed(lambda *a: vg_tan(*a)[0], hp, args.reps)
        _, g_ref = vg_ref(*hp)
        _, g_tan = vg_tan(*hp)
        rel = [abs(float(a) - float(b)) / max(abs(float(b)), 1e-8)
               for a, b in zip(g_tan, g_ref)]
        print(f"[control {n}x{n}] reference-tier bwd {t_ref:.3f} s vs "
              f"scalar-tangent {t_tan:.3f} s ({t_ref / t_tan:.1f}x); "
              f"grad rel err {rel}")


if __name__ == "__main__":
    main()
