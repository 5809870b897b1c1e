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
    Noise,
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
    "Noise",
    "_GaussianLikelihoodBase",
    "_OneDimensionalLikelihood",
]


# -- reference one-file-per-likelihood import paths ---------------------------------------
from .._submodule_alias import install_submodule_aliases as _install

_install(__name__, {
    "bernoulli_likelihood": {"BernoulliLikelihood": BernoulliLikelihood},
    "beta_likelihood": {"BetaLikelihood": BetaLikelihood},
    "gaussian_likelihood": {
        "GaussianLikelihood": GaussianLikelihood,
        "GaussianLikelihoodWithMissingObs": GaussianLikelihoodWithMissingObs,
        "FixedNoiseGaussianLikelihood": FixedNoiseGaussianLikelihood,
        "DirichletClassificationLikelihood": DirichletClassificationLikelihood,
    },
    "hadamard_gaussian_likelihood": {"HadamardGaussianLikelihood": HadamardGaussianLikelihood},
    "laplace_likelihood": {"LaplaceLikelihood": LaplaceLikelihood},
    "likelihood": {"Likelihood": Likelihood},
    "likelihood_list": {"LikelihoodList": LikelihoodList},
    "multitask_gaussian_likelihood": {"MultitaskGaussianLikelihood": MultitaskGaussianLikelihood},
    "negative_binomial_likelihood": {"NegativeBinomialLikelihood": NegativeBinomialLikelihood},
    "noise_models": {
        "HomoskedasticNoise": HomoskedasticNoise,
        "MultitaskHomoskedasticNoise": MultitaskHomoskedasticNoise,
        "HeteroskedasticNoise": HeteroskedasticNoise,
        "FixedGaussianNoise": FixedGaussianNoise,
    },
    "poisson_likelihood": {"PoissonLikelihood": PoissonLikelihood},
    "softmax_likelihood": {"SoftmaxLikelihood": SoftmaxLikelihood},
    "student_t_likelihood": {"StudentTLikelihood": StudentTLikelihood},
})
