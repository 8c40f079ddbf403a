"""Compiled (non-interpret) fused Myrtle parity + timing at a given size."""
import argparse, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

ap = argparse.ArgumentParser()
ap.add_argument("--size", type=int, default=16)
ap.add_argument("--n1", type=int, default=32)
ap.add_argument("--n2", type=int, default=128)
ap.add_argument("--depth", type=int, default=5)
ap.add_argument("--timing-block", type=int, default=0,
                help="also time a [b,b] block at this size")
a = ap.parse_args()

import snngp.ops.pallas.myrtle_gram as mg
from snngp.nn.full import get_myrtle_kernel

rng = np.random.RandomState(0)
x1 = jnp.asarray(rng.rand(a.n1, a.size, a.size, 3), jnp.float32)
x2 = jnp.asarray(rng.rand(a.n2, a.size, a.size, 3), jnp.float32)
hyper = dict(w_std=1.0, b_std=0.1, last_w_std=1.0)

t0 = time.time()
got = np.asarray(mg.myrtle_gram(x1, x2, depth=a.depth, act="relu", **hyper))
print(f"{a.size}x{a.size} fused compile+run: {time.time()-t0:.1f}s", flush=True)

kfn = get_myrtle_kernel(a.depth, 1, "relu", **hyper)
want = np.asarray(jax.jit(lambda p, q: kfn(p, q, get="nngp"))(x1, x2))
rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-6)
print(f"{a.size}x{a.size} compiled parity: max rel err {rel.max():.3e}", flush=True)

if a.timing_block:
    b = a.timing_block
    xb1 = jnp.asarray(rng.rand(b, a.size, a.size, 3), jnp.float32)
    xb2 = jnp.asarray(rng.rand(b, a.size, a.size, 3), jnp.float32)
    fn = jax.jit(lambda p, q: mg.myrtle_gram(p, q, depth=a.depth, act="relu", **hyper))
    np.asarray(fn(xb1, xb2))
    ts = []
    for _ in range(3):
        t0 = time.time(); np.asarray(fn(xb1, xb2)); ts.append(time.time() - t0)
    print(f"{a.size}x{a.size} [{b},{b}] block: {min(ts):.3f}s = "
          f"{min(ts)/(b*b)*1e6:.2f} us/pair", flush=True)
