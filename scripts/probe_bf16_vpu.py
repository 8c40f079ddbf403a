"""Probe: is bf16 elementwise VPU throughput ~2x fp32 on this chip?

Runs the Myrtle activation chain (rsqrt + clip + acos polynomial + sqrt +
fma chain — no rolls, Mosaic rejects bf16 dynamic_rotate) many times over a
resident VMEM block in fp32 vs bf16. If bf16 is not materially faster, the
bf16-pair-state lever for the fused Myrtle kernel is dead on this hardware.

Usage: python scripts/probe_bf16_vpu.py [--iters 200] [--reps 5]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snngp.ops.pallas.gram import _relu_t


def make_fn(dtype, iters, shape):
    def kernel(x_ref, o_ref):
        x = x_ref[:].astype(dtype)
        v1 = jnp.full((shape[0], 1), 1.7, dtype)
        v2 = jnp.full((1, shape[1]), 1.3, dtype)

        def body(i, x):
            return _relu_t(x * 0.9 + 0.05, v1, v2)

        x = jax.lax.fori_loop(0, iters, body, x)
        o_ref[:] = x.astype(jnp.float32)

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )(x)

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--rows", type=int, default=512)
    args = ap.parse_args()
    shape = (args.rows, 1024)
    x = jnp.asarray(np.random.RandomState(0).rand(*shape), jnp.float32)

    for dt in (jnp.float32, jnp.bfloat16):
        fn = make_fn(dt, args.iters, shape)
        np.asarray(fn(x))                      # compile
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            np.asarray(fn(x))
            ts.append(time.time() - t0)
        best = min(ts)
        per = best / args.iters / (shape[0] * shape[1]) * 1e12
        print(f"{jnp.dtype(dt).name}: best {best * 1e3:.1f} ms for "
              f"{args.iters} iters -> {per:.2f} ps/elem/iter", flush=True)


if __name__ == "__main__":
    main()
