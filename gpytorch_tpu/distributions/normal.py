"""Elementwise (diagonal) distributions used by likelihoods and marginals.

These mirror the ``torch.distributions`` objects GPyTorch leans on (Normal, Bernoulli, Gamma,
Beta, Laplace, StudentT, Poisson, NegativeBinomial, Categorical) with explicit-PRNG JAX
sampling and jnp log-probs.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp
from jax.scipy import stats as jstats

from .distribution import Distribution


class Normal(Distribution):
    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(self.scale**2, self.batch_shape)

    @property
    def stddev(self):
        return jnp.broadcast_to(self.scale, self.batch_shape)

    @property
    def batch_shape(self):
        return tuple(jnp.broadcast_shapes(self.loc.shape, self.scale.shape))

    @property
    def event_shape(self):
        return ()

    def log_prob(self, value):
        var = self.scale**2
        return -0.5 * ((value - self.loc) ** 2 / var + jnp.log(2 * math.pi * var))

    def cdf(self, value):
        return 0.5 * (1 + jsp.erf((value - self.loc) / (self.scale * math.sqrt(2.0))))

    def icdf(self, q):
        return self.loc + self.scale * math.sqrt(2.0) * jsp.erfinv(2.0 * q - 1.0)

    def rsample(self, key, sample_shape: Tuple[int, ...] = ()):
        shape = tuple(sample_shape) + self.batch_shape
        return self.loc + self.scale * jax.random.normal(key, shape, dtype=self.loc.dtype)

    def entropy(self):
        return 0.5 * jnp.log(2 * math.pi * self.scale**2) + 0.5

    def expand(self, shape):
        return Normal(jnp.broadcast_to(self.loc, shape), jnp.broadcast_to(self.scale, shape))


class Bernoulli(Distribution):
    def __init__(self, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("specify exactly one of probs/logits")
        if probs is not None:
            self.probs = jnp.asarray(probs)
        else:
            self.probs = jax.nn.sigmoid(jnp.asarray(logits))

    @property
    def mean(self):
        return self.probs

    @property
    def batch_shape(self):
        return self.probs.shape

    @property
    def event_shape(self):
        return ()

    def log_prob(self, value):
        p = jnp.clip(self.probs, 1e-10, 1 - 1e-10)
        return value * jnp.log(p) + (1 - value) * jnp.log1p(-p)

    def rsample(self, key, sample_shape=()):
        return self.sample(key, sample_shape)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.bernoulli(key, self.probs, shape).astype(self.probs.dtype)


class Gamma(Distribution):
    def __init__(self, concentration, rate):
        self.concentration = jnp.asarray(concentration)
        self.rate = jnp.asarray(rate)

    @property
    def mean(self):
        return self.concentration / self.rate

    @property
    def batch_shape(self):
        return tuple(jnp.broadcast_shapes(self.concentration.shape, self.rate.shape))

    @property
    def event_shape(self):
        return ()

    def log_prob(self, value):
        a, b = self.concentration, self.rate
        return a * jnp.log(b) + (a - 1) * jnp.log(value) - b * value - jsp.gammaln(a)

    def rsample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        g = jax.random.gamma(key, jnp.broadcast_to(self.concentration, shape), dtype=self.concentration.dtype)
        return g / self.rate


class Beta(Distribution):
    def __init__(self, concentration1, concentration0):
        self.concentration1 = jnp.asarray(concentration1)
        self.concentration0 = jnp.asarray(concentration0)

    @property
    def mean(self):
        return self.concentration1 / (self.concentration1 + self.concentration0)

    @property
    def batch_shape(self):
        return tuple(jnp.broadcast_shapes(self.concentration1.shape, self.concentration0.shape))

    @property
    def event_shape(self):
        return ()

    def log_prob(self, value):
        a, b = self.concentration1, self.concentration0
        return (a - 1) * jnp.log(value) + (b - 1) * jnp.log1p(-value) - (jsp.gammaln(a) + jsp.gammaln(b) - jsp.gammaln(a + b))

    def rsample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.beta(key, self.concentration1, self.concentration0, shape)


class Laplace(Distribution):
    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def batch_shape(self):
        return tuple(jnp.broadcast_shapes(self.loc.shape, self.scale.shape))

    @property
    def event_shape(self):
        return ()

    def log_prob(self, value):
        return -jnp.abs(value - self.loc) / self.scale - jnp.log(2 * self.scale)

    def rsample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return self.loc + self.scale * jax.random.laplace(key, shape, dtype=self.loc.dtype)


class StudentT(Distribution):
    def __init__(self, df, loc, scale):
        self.df = jnp.asarray(df)
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def batch_shape(self):
        return tuple(jnp.broadcast_shapes(self.df.shape, self.loc.shape, self.scale.shape))

    @property
    def event_shape(self):
        return ()

    def log_prob(self, value):
        df, loc, scale = self.df, self.loc, self.scale
        y = (value - loc) / scale
        z = (
            jsp.gammaln(0.5 * (df + 1))
            - jsp.gammaln(0.5 * df)
            - 0.5 * jnp.log(df * math.pi)
            - jnp.log(scale)
        )
        return z - 0.5 * (df + 1) * jnp.log1p(y**2 / df)

    def rsample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return self.loc + self.scale * jax.random.t(key, self.df, shape, dtype=self.loc.dtype)


class Poisson(Distribution):
    def __init__(self, rate):
        self.rate = jnp.asarray(rate)

    @property
    def mean(self):
        return self.rate

    @property
    def batch_shape(self):
        return self.rate.shape

    @property
    def event_shape(self):
        return ()

    def log_prob(self, value):
        return value * jnp.log(self.rate) - self.rate - jsp.gammaln(value + 1)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.poisson(key, self.rate, shape).astype(self.rate.dtype)

    def rsample(self, key, sample_shape=()):
        return self.sample(key, sample_shape)


class NegativeBinomial(Distribution):
    """total_count/probs parameterization matching torch.distributions.NegativeBinomial."""

    def __init__(self, total_count, probs=None, logits=None):
        self.total_count = jnp.asarray(total_count)
        if probs is not None:
            self.probs = jnp.asarray(probs)
        else:
            self.probs = jax.nn.sigmoid(jnp.asarray(logits))

    @property
    def mean(self):
        return self.total_count * self.probs / (1 - self.probs)

    @property
    def batch_shape(self):
        return tuple(jnp.broadcast_shapes(self.total_count.shape, self.probs.shape))

    @property
    def event_shape(self):
        return ()

    def log_prob(self, value):
        r, p = self.total_count, jnp.clip(self.probs, 1e-10, 1 - 1e-10)
        return (
            jsp.gammaln(value + r)
            - jsp.gammaln(r)
            - jsp.gammaln(value + 1)
            + r * jnp.log1p(-p)
            + value * jnp.log(p)
        )

    def sample(self, key, sample_shape=()):
        k1, k2 = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        lam = jax.random.gamma(k1, jnp.broadcast_to(self.total_count, shape)) * (self.probs / (1 - self.probs))
        return jax.random.poisson(k2, lam).astype(self.probs.dtype)

    def rsample(self, key, sample_shape=()):
        return self.sample(key, sample_shape)


class Categorical(Distribution):
    def __init__(self, probs=None, logits=None):
        if probs is not None:
            self.logits = jnp.log(jnp.clip(jnp.asarray(probs), 1e-30, None))
        else:
            self.logits = jnp.asarray(logits)

    @property
    def probs(self):
        return jax.nn.softmax(self.logits, axis=-1)

    @property
    def batch_shape(self):
        return self.logits.shape[:-1]

    @property
    def event_shape(self):
        return ()

    def log_prob(self, value):
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        value = value.astype(jnp.int32)
        return jnp.take_along_axis(logp, value[..., None], axis=-1)[..., 0]

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.categorical(key, self.logits, shape=shape)

    def rsample(self, key, sample_shape=()):
        return self.sample(key, sample_shape)


class HalfNormal(Distribution):
    def __init__(self, scale):
        self.scale = jnp.asarray(scale)

    @property
    def mean(self):
        return self.scale * math.sqrt(2.0 / math.pi)

    @property
    def batch_shape(self):
        return self.scale.shape

    @property
    def event_shape(self):
        return ()

    def log_prob(self, value):
        return (
            0.5 * math.log(2.0 / math.pi)
            - jnp.log(self.scale)
            - 0.5 * (value / self.scale) ** 2
            + jnp.where(value < 0, -jnp.inf, 0.0)
        )

    def rsample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jnp.abs(jax.random.normal(key, shape, dtype=self.scale.dtype)) * self.scale


class HalfCauchy(Distribution):
    def __init__(self, scale):
        self.scale = jnp.asarray(scale)

    @property
    def batch_shape(self):
        return self.scale.shape

    @property
    def event_shape(self):
        return ()

    def log_prob(self, value):
        return (
            math.log(2.0 / math.pi)
            - jnp.log(self.scale)
            - jnp.log1p((value / self.scale) ** 2)
            + jnp.where(value < 0, -jnp.inf, 0.0)
        )

    def rsample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jnp.abs(jax.random.cauchy(key, shape, dtype=self.scale.dtype)) * self.scale


class LogNormal(Distribution):
    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    @property
    def mean(self):
        return jnp.exp(self.loc + self.scale**2 / 2)

    @property
    def batch_shape(self):
        return tuple(jnp.broadcast_shapes(self.loc.shape, self.scale.shape))

    @property
    def event_shape(self):
        return ()

    def log_prob(self, value):
        logv = jnp.log(value)
        return Normal(self.loc, self.scale).log_prob(logv) - logv

    def rsample(self, key, sample_shape=()):
        return jnp.exp(Normal(self.loc, self.scale).rsample(key, sample_shape))


class Uniform(Distribution):
    def __init__(self, low, high):
        self.low = jnp.asarray(low)
        self.high = jnp.asarray(high)

    @property
    def mean(self):
        return (self.low + self.high) / 2

    @property
    def batch_shape(self):
        return tuple(jnp.broadcast_shapes(self.low.shape, self.high.shape))

    @property
    def event_shape(self):
        return ()

    def log_prob(self, value):
        inside = jnp.logical_and(value >= self.low, value <= self.high)
        return jnp.where(inside, -jnp.log(self.high - self.low), -jnp.inf)

    def rsample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return self.low + (self.high - self.low) * jax.random.uniform(key, shape, dtype=self.low.dtype)
