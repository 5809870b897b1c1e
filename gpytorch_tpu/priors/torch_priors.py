"""Standard priors wrapping elementwise distributions.

Reference: gpytorch/priors/torch_priors.py (NormalPrior :15, HalfNormalPrior :35,
LogNormalPrior :52, UniformPrior :68, HalfCauchyPrior :83, GammaPrior :98,
MultivariateNormalPrior :120).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..distributions import (
    Gamma,
    HalfCauchy,
    HalfNormal,
    LogNormal,
    MultivariateNormal,
    Normal,
    Uniform,
)
from .prior import Prior


class NormalPrior(Prior):
    def __init__(self, loc, scale):
        super().__init__()
        self.register_buffer("loc", jnp.asarray(loc))
        self.register_buffer("scale", jnp.asarray(scale))

    @property
    def mean(self):
        return self.loc

    @property
    def variance(self):
        return self.scale**2

    def log_prob(self, x):
        return Normal(self.loc, self.scale).log_prob(x)

    def sample(self, key, sample_shape=()):
        return Normal(self.loc, self.scale).rsample(key, sample_shape)


class HalfNormalPrior(Prior):
    def __init__(self, scale):
        super().__init__()
        self.register_buffer("scale", jnp.asarray(scale))

    def log_prob(self, x):
        return HalfNormal(self.scale).log_prob(x)

    def sample(self, key, sample_shape=()):
        return HalfNormal(self.scale).rsample(key, sample_shape)


class LogNormalPrior(Prior):
    def __init__(self, loc, scale):
        super().__init__()
        self.register_buffer("loc", jnp.asarray(loc))
        self.register_buffer("scale", jnp.asarray(scale))

    @property
    def mean(self):
        return jnp.exp(self.loc + self.scale**2 / 2)

    def log_prob(self, x):
        return LogNormal(self.loc, self.scale).log_prob(x)

    def sample(self, key, sample_shape=()):
        return LogNormal(self.loc, self.scale).rsample(key, sample_shape)


class UniformPrior(Prior):
    def __init__(self, a, b):
        super().__init__()
        self.register_buffer("low", jnp.asarray(a))
        self.register_buffer("high", jnp.asarray(b))

    def log_prob(self, x):
        return Uniform(self.low, self.high).log_prob(x)

    def sample(self, key, sample_shape=()):
        return Uniform(self.low, self.high).rsample(key, sample_shape)


class HalfCauchyPrior(Prior):
    def __init__(self, scale):
        super().__init__()
        self.register_buffer("scale", jnp.asarray(scale))

    def log_prob(self, x):
        return HalfCauchy(self.scale).log_prob(x)

    def sample(self, key, sample_shape=()):
        return HalfCauchy(self.scale).rsample(key, sample_shape)


class GammaPrior(Prior):
    def __init__(self, concentration, rate):
        super().__init__()
        self.register_buffer("concentration", jnp.asarray(concentration))
        self.register_buffer("rate", jnp.asarray(rate))

    @property
    def mean(self):
        return self.concentration / self.rate

    def log_prob(self, x):
        return Gamma(self.concentration, self.rate).log_prob(x)

    def sample(self, key, sample_shape=()):
        return Gamma(self.concentration, self.rate).rsample(key, sample_shape)


class MultivariateNormalPrior(Prior):
    def __init__(self, mean, covariance_matrix):
        super().__init__()
        self.register_buffer("loc", jnp.asarray(mean))
        self.register_buffer("covariance", jnp.asarray(covariance_matrix))

    def log_prob(self, x):
        return MultivariateNormal(self.loc, self.covariance).log_prob(x)

    def sample(self, key, sample_shape=()):
        return MultivariateNormal(self.loc, self.covariance).rsample(key, sample_shape)
