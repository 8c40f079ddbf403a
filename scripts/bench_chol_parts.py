"""Attribute blocked-Cholesky time to its component ops on the real chip.

Times, at representative shapes (N=16384, block in {512, 1024, 2048}):
  - potrf [b, b]                  (the per-panel jnp.linalg.cholesky)
  - trsm  [N-b, b]                (the panel triangular solve)
  - trtri [b, b] + gemm [N-b, b]  (the panel_inverse alternative)
  - gemm  [N-b, b] @ [b, b]       (one trailing-update block column)
then full blocked_cholesky steady-state with panel_inverse on/off, vs the
monolithic jnp.linalg.cholesky. Device time amortized over a fori_loop to
defeat the ~27 ms tunnel dispatch overhead (same trick as bench.py).
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from snngp.parallel.cholesky import blocked_cholesky

N = int(os.environ.get("CHOL_N", 16384))


def device_time(fn, *args, iters=8):
    """(wall(iters) - wall(1)) / (iters - 1) with the op inside one jit."""

    @jax.jit
    def run(n, *args):
        def body(i, acc):
            scaled = (args[0] * (1.0 + 1e-6 * i),) + args[1:]
            return acc + jnp.sum(fn(*scaled)[..., -1])
        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    def wall(n):
        float(run(n, *args))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(n, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = wall(1)
    tn = wall(iters)
    return max(tn - t1, 0.0) / (iters - 1)


def main():
    rng = np.random.RandomState(0)
    print(f"backend={jax.default_backend()}  N={N}")

    for b in (512, 1024, 2048) if os.environ.get("CHOL_PARTS", "1") == "1" \
            else ():
        xb = rng.randn(b, b).astype(np.float32)
        ab = jnp.asarray(xb @ xb.T / b + 0.1 * np.eye(b, dtype=np.float32))
        tall = jnp.asarray(rng.randn(N - b, b).astype(np.float32))
        eye = jnp.eye(b, dtype=jnp.float32)

        t_potrf = device_time(jnp.linalg.cholesky, ab)
        lkk = jnp.linalg.cholesky(ab)

        t_trsm = device_time(
            lambda t, l: lax.linalg.triangular_solve(
                l, t, left_side=False, lower=True, transpose_a=True),
            tall, lkk)
        t_trtri = device_time(
            lambda l: lax.linalg.triangular_solve(
                l, eye, left_side=False, lower=True, transpose_a=True), lkk)
        inv_t = lax.linalg.triangular_solve(
            lkk, eye, left_side=False, lower=True, transpose_a=True)
        t_gemm = device_time(lambda t, i: t @ i, tall, inv_t)
        print(f"b={b:5d}  potrf {t_potrf*1e3:8.2f} ms   "
              f"trsm[{N-b},{b}] {t_trsm*1e3:8.2f} ms   "
              f"trtri {t_trtri*1e3:8.2f} ms   gemm {t_gemm*1e3:8.2f} ms")

    x = rng.randn(N, N).astype(np.float32)
    a = jnp.asarray(x @ x.T / N + 0.1 * np.eye(N, dtype=np.float32))
    del x

    def steady(fn, label):
        out = fn(a)
        float(jnp.sum(out))                     # compile + first run
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(fn(a)))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:44s} {best*1e3:8.1f} ms")
        return out

    ref = steady(jnp.linalg.cholesky, "monolithic jnp.linalg.cholesky")
    for b in (1024, 2048):
        for inv in (False, True):
            got = steady(
                lambda a, b=b, inv=inv: blocked_cholesky(
                    a, block=b, panel_inverse=inv),
                f"blocked[{b}] panel_inverse={inv}")
            err = float(jnp.max(jnp.abs(jnp.tril(got) - jnp.tril(ref)))
                        / jnp.max(jnp.abs(ref)))
            print(f"{'':44s} rel err vs monolithic: {err:.2e}")


if __name__ == "__main__":
    main()
