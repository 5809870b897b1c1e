from ._approximate_mll import _ApproximateMarginalLogLikelihood
from .added_loss_term import (
    AddedLossTerm,
    InducingPointKernelAddedLossTerm,
    KLGaussianAddedLossTerm,
    NoiseModelAddedLossTerm,
)
from .deep_approximate_mll import DeepApproximateMLL, DeepPredictiveLogLikelihood
from .exact_marginal_log_likelihood import ExactMarginalLogLikelihood
from .leave_one_out_pseudo_likelihood import LeaveOneOutPseudoLikelihood
from .marginal_log_likelihood import MarginalLogLikelihood
from .predictive_log_likelihood import PredictiveLogLikelihood
from .sum_marginal_log_likelihood import SumMarginalLogLikelihood
from .variational_elbo import GammaRobustVariationalELBO, VariationalELBO

import warnings as _warnings


# Deprecated warning shims (reference: gpytorch/mlls/__init__.py:23-37 — "Deprecated for
# 0.4 release"; kept for 100% public-name parity)
class VariationalMarginalLogLikelihood(VariationalELBO):
    def __init__(self, *args, **kwargs):
        _warnings.warn(
            "VariationalMarginalLogLikelihood is deprecated. Please use VariationalELBO instead.",
            DeprecationWarning,
        )
        super().__init__(*args, **kwargs)


class VariationalELBOEmpirical(VariationalELBO):
    def __init__(self, *args, **kwargs):
        _warnings.warn(
            "VariationalELBOEmpirical is deprecated. Please use VariationalELBO instead.",
            DeprecationWarning,
        )
        super().__init__(*args, **kwargs)


__all__ = [
    "AddedLossTerm",
    "DeepApproximateMLL",
    "DeepPredictiveLogLikelihood",
    "ExactMarginalLogLikelihood",
    "GammaRobustVariationalELBO",
    "InducingPointKernelAddedLossTerm",
    "KLGaussianAddedLossTerm",
    "LeaveOneOutPseudoLikelihood",
    "MarginalLogLikelihood",
    "NoiseModelAddedLossTerm",
    "PredictiveLogLikelihood",
    "SumMarginalLogLikelihood",
    "VariationalELBO",
    "VariationalELBOEmpirical",
    "VariationalMarginalLogLikelihood",
    "_ApproximateMarginalLogLikelihood",
]


# -- reference one-file-per-MLL import paths ----------------------------------------------
from .._submodule_alias import install_submodule_aliases as _install

_install(__name__, {
    "added_loss_term": {"AddedLossTerm": AddedLossTerm},
    "deep_approximate_mll": {"DeepApproximateMLL": DeepApproximateMLL},
    "deep_predictive_log_likelihood": {"DeepPredictiveLogLikelihood": DeepPredictiveLogLikelihood},
    "exact_marginal_log_likelihood": {"ExactMarginalLogLikelihood": ExactMarginalLogLikelihood},
    "gamma_robust_variational_elbo": {"GammaRobustVariationalELBO": GammaRobustVariationalELBO},
    "inducing_point_kernel_added_loss_term": {
        "InducingPointKernelAddedLossTerm": InducingPointKernelAddedLossTerm
    },
    "kl_gaussian_added_loss_term": {"KLGaussianAddedLossTerm": KLGaussianAddedLossTerm},
    "leave_one_out_pseudo_likelihood": {"LeaveOneOutPseudoLikelihood": LeaveOneOutPseudoLikelihood},
    "marginal_log_likelihood": {"MarginalLogLikelihood": MarginalLogLikelihood},
    "noise_model_added_loss_term": {"NoiseModelAddedLossTerm": NoiseModelAddedLossTerm},
    "predictive_log_likelihood": {"PredictiveLogLikelihood": PredictiveLogLikelihood},
    "sum_marginal_log_likelihood": {"SumMarginalLogLikelihood": SumMarginalLogLikelihood},
    "variational_elbo": {"VariationalELBO": VariationalELBO},
})
