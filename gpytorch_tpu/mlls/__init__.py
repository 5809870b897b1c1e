from ._approximate_mll import _ApproximateMarginalLogLikelihood
from .added_loss_term import (
    AddedLossTerm,
    InducingPointKernelAddedLossTerm,
    KLGaussianAddedLossTerm,
    NoiseModelAddedLossTerm,
)
from .exact_marginal_log_likelihood import ExactMarginalLogLikelihood
from .marginal_log_likelihood import MarginalLogLikelihood
from .predictive_log_likelihood import PredictiveLogLikelihood
from .variational_elbo import GammaRobustVariationalELBO, VariationalELBO

__all__ = [
    "AddedLossTerm",
    "ExactMarginalLogLikelihood",
    "InducingPointKernelAddedLossTerm",
    "KLGaussianAddedLossTerm",
    "NoiseModelAddedLossTerm",
    "GammaRobustVariationalELBO",
    "MarginalLogLikelihood",
    "PredictiveLogLikelihood",
    "VariationalELBO",
    "_ApproximateMarginalLogLikelihood",
]
