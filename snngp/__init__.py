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

from snngp import nn
from snngp import ops
from snngp import models
from snngp import parallel
from snngp import utils
from snngp import data

__version__ = "0.1.0"

__all__ = ["nn", "ops", "models", "parallel", "utils", "data", "__version__"]
