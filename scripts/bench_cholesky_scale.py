"""North-star-scale Cholesky derisk (VERDICT r2 Next #3a).

Measures COMPILE and RUN wall-clock of blocked_cholesky vs XLA's monolithic
cholesky at N in the tens of thousands on the real chip — the unrolled panel
loops emit O(nb^2/2) HLO ops and the risk is a compile-time blowup exactly
at the scale the kernel exists for.

Usage: python scripts/bench_cholesky_scale.py --sizes 8192,16384,24576 \
           --blocks 1024,2048
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from snngp.parallel.cholesky import blocked_cholesky


def psd_gram(n, key):
    x = jax.random.normal(key, (n, 256), jnp.float32)
    return x @ x.T / 256.0 + 0.1 * jnp.eye(n, dtype=jnp.float32)


def timed_factor(fn, a, label, reps=2):
    wrapped = jax.jit(lambda a: jnp.sum(jnp.log(jnp.diag(fn(a)))))
    t0 = time.time()
    lowered = wrapped.lower(a)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    t0 = time.time()
    out = float(compiled(a))
    t_first = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = float(compiled(a))
        ts.append(time.time() - t0)
    print(f"{label}: trace {t_lower:.1f}s compile {t_compile:.1f}s "
          f"first {t_first:.2f}s steady {min(ts):.3f}s (logdet/2={out:.3f})",
          flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="8192,16384,24576")
    ap.add_argument("--blocks", default="1024,2048")
    args = ap.parse_args()

    for n in [int(s) for s in args.sizes.split(",")]:
        a = psd_gram(n, jax.random.PRNGKey(0))
        a = jax.block_until_ready(a)
        ref = timed_factor(jnp.linalg.cholesky, a, f"N={n} xla-monolithic")
        for b in [int(s) for s in args.blocks.split(",")]:
            nb = -(-n // b)
            got = timed_factor(lambda x, b=b: blocked_cholesky(x, block=b), a,
                               f"N={n} blocked[{b}] (nb={nb})")
            print(f"  logdet match: {abs(got - ref):.2e}", flush=True)
        del a


if __name__ == "__main__":
    main()
