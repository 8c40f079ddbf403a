"""Calibrate MXU matmul throughput vs Cholesky throughput on one chip.

Questions this answers (RESULTS.md round 3):
- What TFLOP/s does a big fp32 matmul reach at precision DEFAULT (bf16
  passes on the MXU) vs HIGHEST (fp32 via multi-pass)?
- Where does jnp.linalg.cholesky sit relative to that — i.e. how much of
  the factorization phase is MXU-bound headroom vs algorithmic serialization?
- Does forcing bf16 inputs on the blocked kernel's trailing updates buy
  anything (mixed-precision POTRF: fp32 panel, bf16 MXU syrk)?

Device-only timing via the amortized fori_loop trick (bench.py): run the op
n times inside one jit with an input perturbation defeating CSE and report
(wall(n) - wall(1)) / (n - 1), removing the ~27 ms tunnel dispatch floor.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

# Import snngp FIRST: its __init__ pins jax_default_matmul_precision to
# 'highest', and every row of this calibration must run under the same
# config (the explicit per-op `precision=` args below override it where
# the row says so).
import snngp  # noqa: F401
from snngp.parallel.cholesky import blocked_cholesky

N = 16384


def device_time(build, x, n=6):
    @jax.jit
    def run(x, n):
        def body(i, acc):
            return acc + build(x * (1.0 + 1e-6 * i))
        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    def wall(k):
        float(run(x, k))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x, k))
            best = min(best, time.perf_counter() - t0)
        return best

    return (wall(n) - wall(1)) / (n - 1)


def main():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (N, N), jnp.float32)

    flops_mm = 2.0 * N**3
    for prec in (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST):
        t = device_time(
            lambda x, p=prec: jnp.sum(
                jnp.matmul(x, x, precision=p)), a)
        print(f"matmul[{N}x{N}] fp32 precision={prec}: {t*1e3:.1f} ms  "
              f"{flops_mm/t/1e12:.1f} TFLOP/s")

    ab = a.astype(jnp.bfloat16)
    t = device_time(lambda x: jnp.sum(jnp.matmul(x, x).astype(jnp.float32)), ab)
    print(f"matmul[{N}x{N}] bf16 inputs: {t*1e3:.1f} ms  "
          f"{flops_mm/t/1e12:.1f} TFLOP/s")

    # PSD matrix for factorizations.
    psd = (a @ a.T) / N + 10.0 * jnp.eye(N, dtype=jnp.float32)
    flops_chol = N**3 / 3.0

    t = device_time(lambda x: jnp.sum(jnp.linalg.cholesky(x)), psd)
    print(f"cholesky[{N}] monolithic: {t*1e3:.1f} ms  "
          f"{flops_chol/t/1e12:.1f} TFLOP/s (fp32-equivalent)")

    for block in (1024, 2048):
        t = device_time(
            lambda x, b=block: jnp.sum(blocked_cholesky(x, block=b)),
            psd)
        print(f"blocked_cholesky[{N}] block={block}: {t*1e3:.1f} ms  "
              f"{flops_chol/t/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
