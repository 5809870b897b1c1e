from .likelihood import Likelihood, LikelihoodList, _OneDimensionalLikelihood
from .gaussian_likelihood import (
    DirichletClassificationLikelihood,
    FixedNoiseGaussianLikelihood,
    GaussianLikelihood,
    GaussianLikelihoodWithMissingObs,
    HadamardGaussianLikelihood,
    _GaussianLikelihoodBase,
)
from .multitask_gaussian_likelihood import MultitaskGaussianLikelihood, _MultitaskGaussianLikelihoodBase
from .non_gaussian import (
    BernoulliLikelihood,
    BetaLikelihood,
    LaplaceLikelihood,
    NegativeBinomialLikelihood,
    PoissonLikelihood,
    SoftmaxLikelihood,
    StudentTLikelihood,
    log_normal_cdf,
)
from .noise_models import (
    FixedGaussianNoise,
    HeteroskedasticNoise,
    HomoskedasticNoise,
    MultitaskHomoskedasticNoise,
)

__all__ = [
    "BernoulliLikelihood",
    "BetaLikelihood",
    "DirichletClassificationLikelihood",
    "LaplaceLikelihood",
    "NegativeBinomialLikelihood",
    "PoissonLikelihood",
    "SoftmaxLikelihood",
    "StudentTLikelihood",
    "log_normal_cdf",
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
    "_MultitaskGaussianLikelihoodBase",
    "MultitaskHomoskedasticNoise",
    "_GaussianLikelihoodBase",
    "_OneDimensionalLikelihood",
]
