"""TPU timing: bf16 vs fp32 fused Myrtle Gram at the north-star shape.

Measures steady-state seconds per 512x512-pair block at 32x32 (the
myrtle_gram_tiled dispatch unit) and the bf16-vs-fp32 Gram error.

Usage:  python scripts/bench_myrtle_bf16.py [--block 512] [--reps 3]
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
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--strip-rows", type=int, default=0,
                    help="override myrtle_gram._STRIP_ROWS (0 = default)")
    ap.add_argument("--dtypes", default="float32,bf16")
    args = ap.parse_args()

    import snngp.ops.pallas.myrtle_gram as mg
    if args.strip_rows:
        mg._STRIP_ROWS = args.strip_rows

    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.rand(args.block, 32, 32, 3), jnp.float32)
    x2 = jnp.asarray(rng.rand(args.block, 32, 32, 3), jnp.float32)
    hyper = dict(w_std=1.0, b_std=0.1, last_w_std=1.0)

    outs = {}
    for dt in args.dtypes.split(","):
        fn = jax.jit(lambda a, b: mg.myrtle_gram(
            a, b, depth=args.depth, act="relu", dtype=None if dt == "float32"
            else dt, **hyper))
        t0 = time.time()
        out = np.asarray(fn(x1, x2))          # compile + run
        print(f"{dt}: first call (incl. compile) {time.time() - t0:.1f}s",
              flush=True)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            out = np.asarray(fn(x1, x2))
            ts.append(time.time() - t0)
        best = min(ts)
        per_pair = best / (args.block * args.block) * 1e6
        print(f"{dt}: steady {best:.3f}s/block = {per_pair:.1f} us/pair "
              f"(all reps: {[f'{t:.3f}' for t in ts]})", flush=True)
        outs[dt] = out

    if len(outs) == 2:
        a, b = outs.values()
        rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-3)
        print(f"bf16 vs fp32: max rel err {rel.max():.3e}, "
              f"mean {rel.mean():.3e}", flush=True)


if __name__ == "__main__":
    main()
