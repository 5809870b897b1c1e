from ._approximate_mll import _ApproximateMarginalLogLikelihood
from .exact_marginal_log_likelihood import ExactMarginalLogLikelihood
from .marginal_log_likelihood import MarginalLogLikelihood
from .predictive_log_likelihood import PredictiveLogLikelihood
from .variational_elbo import GammaRobustVariationalELBO, VariationalELBO

__all__ = [
    "ExactMarginalLogLikelihood",
    "GammaRobustVariationalELBO",
    "MarginalLogLikelihood",
    "PredictiveLogLikelihood",
    "VariationalELBO",
    "_ApproximateMarginalLogLikelihood",
]
