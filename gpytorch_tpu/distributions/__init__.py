from . import normal as base_distributions  # reference distributions/__init__.py:11-17
from .delta import Delta
from .distribution import Distribution
from .multitask_multivariate_normal import MultitaskMultivariateNormal
from .multivariate_normal import MultivariateNormal, kl_divergence
from .normal import (
    Bernoulli,
    Beta,
    Categorical,
    Gamma,
    HalfCauchy,
    HalfNormal,
    Laplace,
    LogNormal,
    NegativeBinomial,
    Normal,
    Poisson,
    StudentT,
    Uniform,
)

__all__ = [
    "Bernoulli",
    "base_distributions",
    "Beta",
    "Categorical",
    "Delta",
    "Distribution",
    "Gamma",
    "HalfCauchy",
    "HalfNormal",
    "Laplace",
    "LogNormal",
    "MultitaskMultivariateNormal",
    "MultivariateNormal",
    "NegativeBinomial",
    "Normal",
    "Poisson",
    "StudentT",
    "Uniform",
    "kl_divergence",
]
