"""Probe: packed-bf16 vs fp32 VPU throughput on a pure FMA chain (no
compares/selects — Mosaic rejects cmpf on packed bf16) and on an
FMA+rsqrt+sqrt chain. Sizes the ceiling of any bf16-state variant."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl

SHAPE = (512, 1024)
ITERS = 400

def make(dtype, kind):
    def kernel(x_ref, o_ref):
        x = x_ref[:].astype(dtype)
        def fma(i, x):
            # 8-FMA chain (the acos polynomial shape)
            for c in (0.9, -0.8, 0.7, -0.6, 0.5, -0.4, 0.3, -0.2):
                x = x * 0.97 + c
            return x
        def trans(i, x):
            x = x * 0.9 + 0.1
            r = jax.lax.rsqrt(jnp.abs(x) + 1.0)
            return x * r + jnp.sqrt(jnp.abs(x))
        x = jax.lax.fori_loop(0, ITERS, fma if kind == "fma" else trans, x)
        o_ref[:] = x.astype(jnp.float32)
    @jax.jit
    def fn(x):
        return pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32))(x)
    return fn

x = jnp.asarray(np.random.RandomState(0).rand(*SHAPE), jnp.float32)
for kind in ("fma", "trans"):
    for dt in (jnp.float32, jnp.bfloat16):
        try:
            fn = make(dt, kind)
            np.asarray(fn(x))
            ts = [0] * 3
            for i in range(3):
                t0 = time.time(); np.asarray(fn(x)); ts[i] = time.time() - t0
            print(f"{kind} {jnp.dtype(dt).name}: {min(ts)*1e3:.1f} ms / {ITERS} iters", flush=True)
        except Exception as e:
            print(f"{kind} {jnp.dtype(dt).name}: FAILED {str(e)[:200]}", flush=True)
