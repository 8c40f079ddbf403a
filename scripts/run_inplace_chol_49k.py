"""North-star-size Cholesky on ONE chip via the in-place blocked kernel.

At n = 49152 a fp32 Gram is 9.7 GB. ``jnp.linalg.cholesky`` (and the
out-of-place ``blocked_cholesky``) need input + output buffers — ~19.3 GB,
an OOM on a 16 GB v5e. ``inplace_blocked_cholesky`` donates the operand and
factors inside the one buffer, so the whole factorization fits with ~6 GB to
spare.

Correctness at a size where no reference factorization can run on-device:
the test matrix is K = I + X X^T / r with X [n, r], whose log-determinant is
exactly logdet(I_r + X^T X / r) (Weinstein–Aronszajn) — an [r, r] float64
computation on the host.

Usage: python scripts/run_inplace_chol_49k.py [n] [r]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from snngp.parallel.cholesky import inplace_blocked_cholesky


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    x = jax.random.normal(jax.random.PRNGKey(0), (n, r), jnp.float32)

    @jax.jit
    def build(x):
        return jnp.matmul(x, x.T) / r + jnp.eye(n, dtype=jnp.float32)

    # Exact ground truth on the small side (float64, host).
    xs = np.asarray(x, np.float64)
    want_logdet = np.linalg.slogdet(np.eye(r) + xs.T @ xs / r)[1]

    for it in range(2):
        t0 = time.perf_counter()
        k = build(x)
        k.block_until_ready()
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        u = inplace_blocked_cholesky(k)   # donates k; returns the UPPER factor
        logdet = 2.0 * float(jnp.sum(jnp.log(jnp.diagonal(u))))
        t_chol = time.perf_counter() - t0
        del u

        rel = abs(logdet - want_logdet) / abs(want_logdet)
        tf = n**3 / 3 / t_chol / 1e12
        label = "first (compile)" if it == 0 else "steady"
        print(f"n={n} {label}: build {t_build:.2f}s  cholesky {t_chol:.2f}s "
              f"({tf:.1f} TFLOP/s incl. dispatch)  "
              f"logdet {logdet:.4f} vs exact {want_logdet:.4f} "
              f"(rel err {rel:.2e})", flush=True)


if __name__ == "__main__":
    main()
