from .likelihood import Likelihood, LikelihoodList, _OneDimensionalLikelihood
from .gaussian_likelihood import (
    DirichletClassificationLikelihood,
    FixedNoiseGaussianLikelihood,
    GaussianLikelihood,
    GaussianLikelihoodWithMissingObs,
    HadamardGaussianLikelihood,
    _GaussianLikelihoodBase,
)
from .multitask_gaussian_likelihood import MultitaskGaussianLikelihood
from .noise_models import (
    FixedGaussianNoise,
    HeteroskedasticNoise,
    HomoskedasticNoise,
    MultitaskHomoskedasticNoise,
)

__all__ = [
    "DirichletClassificationLikelihood",
    "FixedGaussianNoise",
    "FixedNoiseGaussianLikelihood",
    "GaussianLikelihood",
    "GaussianLikelihoodWithMissingObs",
    "HadamardGaussianLikelihood",
    "HeteroskedasticNoise",
    "HomoskedasticNoise",
    "Likelihood",
    "LikelihoodList",
    "MultitaskGaussianLikelihood",
    "MultitaskHomoskedasticNoise",
    "_GaussianLikelihoodBase",
    "_OneDimensionalLikelihood",
]
