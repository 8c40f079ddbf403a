"""Measure the persistent compilation cache's effect on TPU compile cost.

Runs one fused Pallas Gram compile (the dominant per-process cost through a
remote-compile tunnel) plus one scan-chunked-style XLA compile, printing
wall-clock. Run twice in separate processes: the second run should hit
~/.cache/snngp-xla (snngp/__init__.py enables the cache) if the backend's
PJRT client supports executable serialization.

    python scripts/bench_compile_cache.py          # first (cold) process
    python scripts/bench_compile_cache.py          # second (cached) process
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import snngp  # noqa: F401  (enables the cache)
from snngp.nn.arch import get_cnn_kernel

cache_dir = os.path.expanduser("~/.cache/snngp-xla")
n0 = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
print(f"backend={jax.default_backend()}  cache entries before: {n0}")

rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(256, 16, 16, 3), jnp.float32)

# fused conv-Gram (Pallas kernel, remote Mosaic compile on TPU)
kfn = get_cnn_kernel(3, 1, "relu")
t0 = time.time()
k = jax.jit(lambda a: kfn(a, a, get="nngp"))(x)
float(jnp.sum(k))
print(f"conv-NNGP Gram [256,256]@16x16 compile+run: {time.time() - t0:.1f}s")

# a plain XLA computation large enough to clear the 0.5s cache threshold
t1 = time.time()
c = jax.jit(lambda a: jnp.linalg.cholesky(
    a @ a.T + 4096 * jnp.eye(a.shape[0])))(k)
float(jnp.sum(c))
print(f"gram+cholesky [256,256] compile+run: {time.time() - t1:.1f}s")

n1 = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
print(f"cache entries after: {n1}")
