"""Execute (not just compile) cyclic_cholesky at north-star-adjacent N on the
emulated 8-device CPU mesh, asserting logdet parity vs the monolithic op.

Round-3 extension of the D3 validation ladder: round 2 validated cyclic at
N~512 (CPU mesh) and measured compile-only at N=49k; this actually runs the
factorization at N=8192 on the 8-way mesh (measured: 141.6 s compile+run,
logdet rel err 0.0e+00 vs the monolithic op).

Emulator ceiling, NOT a kernel limit: at N=16384 the run dies in XLA's CPU
collective rendezvous ("Termination timeout ... of 40 seconds exceeded") —
on a 1-core host the 8 emulated devices execute their inter-psum panel work
serially, so they reach each all-reduce more than 40 s apart and XLA's
hardcoded watchdog aborts. Real multi-chip meshes run devices concurrently
and do not serialize this way.

Usage: python scripts/run_cyclic_16k.py [--n 8192] [--block 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from snngp.parallel import get_mesh
from snngp.parallel.cholesky import cyclic_cholesky


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--block", type=int, default=1024)
    args = ap.parse_args()

    mesh = get_mesh(8)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (args.n, 256), jnp.float32)
    a = x @ x.T / 256.0 + 0.1 * jnp.eye(args.n, dtype=jnp.float32)
    a = jax.block_until_ready(a)

    logdet_cyc = jax.jit(lambda a: 2.0 * jnp.sum(jnp.log(jnp.diag(
        cyclic_cholesky(a, mesh, block=args.block)))))
    logdet_ref = jax.jit(lambda a: 2.0 * jnp.sum(jnp.log(jnp.diag(
        jnp.linalg.cholesky(a)))))

    t0 = time.time()
    got = float(logdet_cyc(a))
    t_cyc = time.time() - t0
    t0 = time.time()
    want = float(logdet_ref(a))
    t_ref = time.time() - t0
    rel = abs(got - want) / abs(want)
    print(f"N={args.n} block={args.block} 8-dev CPU mesh: cyclic "
          f"{t_cyc:.1f}s (compile+run) vs monolithic {t_ref:.1f}s; "
          f"logdet rel err {rel:.2e}")
    assert rel < 1e-5, rel
    print("PASS")


if __name__ == "__main__":
    main()
