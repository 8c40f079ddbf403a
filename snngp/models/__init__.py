"""Probabilistic layer: bijectors, params substrate, kernels, priors,
likelihoods, and the SPR/SVSP scale-mixture process models."""

from snngp.models import bijectors
from snngp.models import params
from snngp.models.bijectors import positive, Softplus, Exp
from snngp.models.kernels import NNGPKernel
from snngp.models.priors import Prior, GaussianPrior, InverseGammaPrior
from snngp.models.likelihoods import Likelihood, GaussianLikelihood, StudentTLikelihood
from snngp.models.gp import SPR, SVSP
from snngp.models.predictor import fit_spr, FittedSPR, fit_svsp, FittedSVSP

__all__ = [
    "bijectors", "params", "positive", "Softplus", "Exp",
    "NNGPKernel", "Prior", "GaussianPrior", "InverseGammaPrior",
    "Likelihood", "GaussianLikelihood", "StudentTLikelihood", "SPR", "SVSP",
    "fit_spr", "FittedSPR", "fit_svsp", "FittedSVSP",
]
