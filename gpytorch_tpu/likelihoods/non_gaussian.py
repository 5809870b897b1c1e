"""Non-Gaussian likelihoods.

References: gpytorch/likelihoods/bernoulli_likelihood.py:17 (probit, closed-form marginal
:73-75), beta_likelihood.py:17, laplace_likelihood.py:17, student_t_likelihood.py:17,
poisson_likelihood.py:13 (softplus rate), negative_binomial_likelihood.py:15,
softmax_likelihood.py:17 (multiclass mixing weights).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm as jnorm

from ..constraints import GreaterThan, Interval, Positive
from ..distributions import (
    Bernoulli,
    Beta,
    Categorical,
    Laplace,
    MultivariateNormal,
    NegativeBinomial,
    Poisson,
    StudentT,
)
from .likelihood import Likelihood, _OneDimensionalLikelihood


def log_normal_cdf(x):
    """Stable log Φ(x) (reference: gpytorch/functions/_log_normal_cdf.py — asymptotic series;
    jax.scipy's logcdf is already stable on TPU)."""
    return jnorm.logcdf(x)


class BernoulliLikelihood(_OneDimensionalLikelihood):
    """Probit classification (reference :17)."""

    def forward(self, function_samples, *args, **kwargs) -> Bernoulli:
        probs = jnorm.cdf(function_samples)
        return Bernoulli(probs=probs)

    def log_marginal(self, observations, function_dist: MultivariateNormal, *args, **kwargs):
        """Closed form: log Φ(y μ / √(1+σ²)) (reference :73-75).  Labels are {0,1},
        mapped to ±1 internally (reference convention)."""
        marginal = self.marginal(function_dist)
        obs = observations * 2.0 - 1.0
        return log_normal_cdf(obs * marginal._z)

    def marginal(self, function_dist: MultivariateNormal, *args, **kwargs) -> Bernoulli:
        mean = function_dist.mean
        var = function_dist.variance
        z = mean / jnp.sqrt(1.0 + var)
        out = Bernoulli(probs=jnorm.cdf(z))
        out._z = z
        return out

    def expected_log_prob(self, observations, function_dist, *args, **kwargs):
        obs = observations * 2.0 - 1.0  # {0,1} → ±1
        log_prob_lambda = lambda f: log_normal_cdf(f * obs)
        return self.quadrature(log_prob_lambda, function_dist)


class BetaLikelihood(_OneDimensionalLikelihood):
    """Beta regression on [0,1] targets: α = σ(f)s, β = (1−σ(f))s (reference :17)."""

    def __init__(self, batch_shape=(), scale_prior=None, scale_constraint=None, dtype=jnp.float32):
        super().__init__()
        self.batch_shape = tuple(batch_shape)
        self.register_parameter("raw_scale", jnp.ones(self.batch_shape + (1,), dtype=dtype))
        self.register_constraint("raw_scale", scale_constraint or Positive())
        if scale_prior is not None:
            self.register_prior("scale_prior", scale_prior, lambda m: m.scale, lambda m, v: m._set_constrained("raw_scale", v))

    @property
    def scale(self):
        return self._constrained("raw_scale")

    @scale.setter
    def scale(self, value):
        self._set_constrained("raw_scale", value)

    def forward(self, function_samples, *args, **kwargs) -> Beta:
        mixture = jax.nn.sigmoid(function_samples)
        scale = self.scale
        alpha = mixture * scale + 1e-10
        beta = scale - alpha + 2e-10
        return Beta(concentration1=alpha, concentration0=beta)


class LaplaceLikelihood(_OneDimensionalLikelihood):
    """Reference: laplace_likelihood.py:17."""

    def __init__(self, batch_shape=(), noise_prior=None, noise_constraint=None, dtype=jnp.float32):
        super().__init__()
        self.batch_shape = tuple(batch_shape)
        self.register_parameter("raw_noise", jnp.zeros(self.batch_shape + (1,), dtype=dtype))
        self.register_constraint("raw_noise", noise_constraint or Positive())
        if noise_prior is not None:
            self.register_prior("noise_prior", noise_prior, lambda m: m.noise, lambda m, v: m._set_constrained("raw_noise", v))

    @property
    def noise(self):
        return self._constrained("raw_noise")

    @noise.setter
    def noise(self, value):
        self._set_constrained("raw_noise", value)

    def forward(self, function_samples, *args, **kwargs) -> Laplace:
        return Laplace(loc=function_samples, scale=jnp.sqrt(self.noise))


class StudentTLikelihood(_OneDimensionalLikelihood):
    """Reference: student_t_likelihood.py:17."""

    def __init__(self, batch_shape=(), deg_free_prior=None, deg_free_constraint=None, noise_prior=None, noise_constraint=None, dtype=jnp.float32):
        super().__init__()
        self.batch_shape = tuple(batch_shape)
        self.register_parameter("raw_deg_free", jnp.zeros(self.batch_shape + (1,), dtype=dtype))
        self.register_constraint("raw_deg_free", deg_free_constraint or GreaterThan(2.0))
        self.register_parameter("raw_noise", jnp.zeros(self.batch_shape + (1,), dtype=dtype))
        self.register_constraint("raw_noise", noise_constraint or Positive())
        if deg_free_prior is not None:
            self.register_prior("deg_free_prior", deg_free_prior, lambda m: m.deg_free, lambda m, v: m._set_constrained("raw_deg_free", v))
        if noise_prior is not None:
            self.register_prior("noise_prior", noise_prior, lambda m: m.noise, lambda m, v: m._set_constrained("raw_noise", v))
        # reference initializes deg_free to 7
        self.deg_free = 7.0

    @property
    def deg_free(self):
        return self._constrained("raw_deg_free")

    @deg_free.setter
    def deg_free(self, value):
        self._set_constrained("raw_deg_free", value)

    @property
    def noise(self):
        return self._constrained("raw_noise")

    @noise.setter
    def noise(self, value):
        self._set_constrained("raw_noise", value)

    def forward(self, function_samples, *args, **kwargs) -> StudentT:
        return StudentT(df=self.deg_free, loc=function_samples, scale=jnp.sqrt(self.noise))


class PoissonLikelihood(_OneDimensionalLikelihood):
    """Rate = softplus(f) (reference: poisson_likelihood.py:43-45)."""

    def forward(self, function_samples, *args, **kwargs) -> Poisson:
        return Poisson(rate=jax.nn.softplus(function_samples))


class NegativeBinomialLikelihood(_OneDimensionalLikelihood):
    """Mean = softplus(f); learned success probability (reference :15)."""

    def __init__(self, batch_shape=(), probs_prior=None, probs_constraint=None, dtype=jnp.float32):
        super().__init__()
        self.batch_shape = tuple(batch_shape)
        self.register_parameter("raw_probs", jnp.zeros(self.batch_shape + (1,), dtype=dtype))
        self.register_constraint("raw_probs", probs_constraint or Interval(0.0, 1.0))
        if probs_prior is not None:
            self.register_prior("probs_prior", probs_prior, lambda m: m.probs, lambda m, v: m._set_constrained("raw_probs", v))

    @property
    def probs(self):
        return self._constrained("raw_probs")

    @probs.setter
    def probs(self, value):
        self._set_constrained("raw_probs", value)

    def forward(self, function_samples, *args, **kwargs) -> NegativeBinomial:
        probs = jnp.clip(self.probs, 1e-6, 1 - 1e-6)
        num_failures = jax.nn.softplus(function_samples) * (1 - probs) / probs
        return NegativeBinomial(total_count=num_failures, probs=probs)


class SoftmaxLikelihood(Likelihood):
    """Multiclass classification via (optionally mixed) latent functions
    (reference: softmax_likelihood.py:17)."""

    def __init__(
        self,
        num_features: Optional[int] = None,
        num_classes: Optional[int] = None,
        mixing_weights: bool = True,
        mixing_weights_prior=None,
        dtype=jnp.float32,
    ):
        super().__init__()
        if num_classes is None:
            raise ValueError("num_classes is required")
        self.num_classes = int(num_classes)
        self.has_mixing_weights = bool(mixing_weights)
        if mixing_weights:
            if num_features is None:
                raise ValueError("num_features is required with mixing weights")
            self.num_features = int(num_features)
            self.register_parameter(
                "mixing_weights",
                jax.random.normal(jax.random.PRNGKey(0), (num_classes, num_features), dtype=dtype)
                / math.sqrt(num_features),
            )
            if mixing_weights_prior is not None:
                self.register_prior("mixing_weights_prior", mixing_weights_prior, "mixing_weights", None)
        else:
            self.num_features = int(num_classes)

    def forward(self, function_samples, *args, **kwargs) -> Categorical:
        num_data = function_samples.shape[-1]
        # function_samples: (..., t, n) — latent-function batch then data (reference layout)
        if function_samples.ndim >= 2 and function_samples.shape[-2] == self.num_features:
            fs = jnp.swapaxes(function_samples, -1, -2)  # (..., n, t)
        else:
            fs = function_samples
        if self.has_mixing_weights:
            mixed = fs @ jnp.swapaxes(self.mixing_weights.astype(fs.dtype), -1, -2)  # (..., n, c)
        else:
            mixed = fs
        return Categorical(logits=mixed)

    def __call__(self, input, *args, **kwargs):
        if isinstance(input, MultivariateNormal):
            return self.marginal(input, *args, **kwargs)
        return self.forward(jnp.asarray(input), *args, **kwargs)
