"""snngp — TPU-native Scale Mixtures of Neural Network Gaussian Processes.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the ICLR 2022
reference implementation (see /root/reference, surveyed in SURVEY.md):

- ``snngp.nn``       compositional NNGP/NTK kernel engine (replaces
                     ``neural_tangents.stax``; reference usage at
                     ``experiments/nt_kernels.py:21-103``).
- ``snngp.ops``      dense linear algebra (Cholesky solves, GP predictive,
                     fused log-marginal-likelihood), multivariate Student-t
                     primitives, softmax MC likelihood estimators, Pallas TPU
                     kernels for Gram materialization.
- ``snngp.models``   probabilistic layer: bijector-constrained parameters,
                     priors (Gaussian / InverseGamma), likelihoods
                     (Gaussian / Student-t), exact SPR and sparse variational
                     SVSP models (reference ``spax/``).
- ``snngp.parallel`` device-mesh runtime: sharded Gram construction and
                     distributed blocked Cholesky over ICI.
- ``snngp.utils``    training utilities: optimizers, LR plateau scheduler,
                     data loader, checkpointing (reference
                     ``experiments/utils.py``), logging.
- ``snngp.data``     dataset layer: UCI/synthetic regression, image
                     classification with ood/imbalanced/noisy transforms.
- ``snngp.cli``      argparse command tree: {regression|classification|
                     ensemble} x {train|test|find} (reference ``run.py``).
"""

import os as _os

import jax as _jax

# GP Gram matrices are routinely near-singular; TPU's default bf16 matmul
# passes inject ~1e-2 relative error — enough to break Cholesky PSD-ness.
# Default to true fp32 matmuls (overridable via JAX_DEFAULT_MATMUL_PRECISION).
if "JAX_DEFAULT_MATMUL_PRECISION" not in _os.environ:
    _jax.config.update("jax_default_matmul_precision", "highest")

# Persistent on-disk compilation cache. Pallas/Mosaic kernel compiles cost
# 1-8 minutes per process through a remote-compile tunnel (RESULTS.md), and
# plain XLA compiles of the scan-chunked training steps are tens of seconds;
# caching the serialized executables amortizes both across CLI invocations
# (e.g. `reg tr` then `reg ts`, or re-running a benchmark). Respects an
# explicit JAX_COMPILATION_CACHE_DIR; set it empty to disable. Backends whose
# PJRT client cannot serialize executables simply skip the cache (JAX logs
# a warning, nothing breaks).
def _host_fingerprint():
    # XLA:CPU AOT executables bake in the compile host's ISA features, but
    # the persistent-cache key does NOT include them: a cache written on one
    # VM host and read after a migration loads mismatched AOT code (XLA
    # E-logs "could lead to execution errors such as SIGILL"). Keying the
    # default cache dir on the cpuinfo flags line makes each host population
    # self-consistent; TPU entries are host-independent and just recompile
    # once per new host.
    try:
        import hashlib
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "generic"


_cache_dir = _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.expanduser("~"), ".cache",
                  f"snngp-xla-{_host_fingerprint()}"))
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # Default thresholds skip sub-second compiles and small executables;
    # keep everything — the dominant cost here is the remote round-trip.
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from snngp import nn
from snngp import ops
from snngp import models
from snngp import parallel
from snngp import utils
from snngp import data

__version__ = "0.1.0"

__all__ = ["nn", "ops", "models", "parallel", "utils", "data", "__version__"]
