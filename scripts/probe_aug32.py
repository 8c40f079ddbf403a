"""Probe: single-tangent augmented Myrtle pass at 32x32 on real TPU.

Round 4 established that the THREE-state augmented kernel (value + both
scale tangents) needs 16.66 MB of scoped VMEM against Mosaic's 16 MB budget
at 32x32. This probes the TWO-state single-tangent dispatch (VERDICT r4 #3
option (a)): compile, run, parity vs the reference full tier's jax.grad,
and steady-state throughput on a [512, 512] block.

Usage: python scripts/probe_aug32.py [--block 512] [--skip-parity]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from snngp.ops.pallas.myrtle_gram import myrtle_gram_scale_grads
from snngp.nn.full import get_myrtle_kernel

HP = dict(w_std=1.2, b_std=0.25, last_w_std=0.9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--depth", type=int, default=5)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices())

    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    x2 = jnp.asarray(rng.rand(128, 32, 32, 3), jnp.float32)

    t0 = time.time()
    k, dkw, dkb = myrtle_gram_scale_grads(x1, x2, depth=args.depth,
                                          act="relu", **HP)
    k, dkw, dkb = map(np.asarray, (k, dkw, dkb))
    print(f"COMPILED+RAN single-tangent 32x32 in {time.time() - t0:.1f}s; "
          f"finite: {np.isfinite(k).all()} {np.isfinite(dkw).all()} "
          f"{np.isfinite(dkb).all()}")

    if not args.skip_parity:
        xs1, xs2 = x1[:4], x2[:8]
        g = jnp.asarray(rng.rand(4, 8), jnp.float32)

        def loss_ref(w, b, l):
            kfn = get_myrtle_kernel(args.depth, 1, "relu", w_std=w, b_std=b,
                                    last_w_std=l)
            return jnp.sum(g * kfn(xs1, xs2, get="nngp"))

        want = jax.grad(loss_ref, argnums=(0, 1))(
            jnp.float32(HP["w_std"]), jnp.float32(HP["b_std"]),
            jnp.float32(HP["last_w_std"]))
        ks, dw, db = myrtle_gram_scale_grads(xs1, xs2, depth=args.depth,
                                             act="relu", **HP)
        got = (float(jnp.sum(g * dw)), float(jnp.sum(g * db)))
        rel = [abs(a - float(b)) / max(abs(float(b)), 1e-30)
               for a, b in zip(got, want)]
        print(f"grad parity vs reference-tier fp32 jax.grad: "
              f"dw rel {rel[0]:.2e}, db rel {rel[1]:.2e}")
        assert max(rel) < 1e-4, rel

    # steady-state throughput on the assembly block shape
    b = args.block
    xa = jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32)
    xb = jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32)
    out = myrtle_gram_scale_grads(xa, xb, depth=args.depth, act="relu", **HP)
    _ = [np.asarray(o) for o in out]                 # compile at block shape
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = myrtle_gram_scale_grads(xa, xb, depth=args.depth, act="relu",
                                      **HP)
        _ = [np.asarray(o) for o in out]
        best = min(best, time.perf_counter() - t0)
    print(f"augmented split [{b},{b}] block: {best:.3f} s "
          f"({best / (b * b) * 1e6:.2f} us/pair)")


if __name__ == "__main__":
    main()
