"""SmoothedBoxPrior (reference: gpytorch/priors/smoothed_box_prior.py:17):
~uniform on [a,b] with Gaussian tails of width sigma outside."""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..distributions import Normal
from .prior import Prior


class SmoothedBoxPrior(Prior):
    def __init__(self, a, b, sigma=0.01):
        super().__init__()
        a = jnp.asarray(a, dtype=jnp.result_type(float))
        b = jnp.asarray(b, dtype=jnp.result_type(float))
        self.register_buffer("a", jnp.minimum(a, b))
        self.register_buffer("b", jnp.maximum(a, b))
        self.register_buffer("sigma", jnp.asarray(sigma, dtype=jnp.result_type(float)))

    @property
    def _c(self):
        return (self.a + self.b) / 2

    @property
    def _r(self):
        return (self.b - self.a) / 2

    @property
    def _M(self):
        # normalization: (b-a) + sqrt(2π)σ
        return jnp.log1p((self.b - self.a) / (math.sqrt(2 * math.pi) * self.sigma))

    def log_prob(self, x):
        # distance to the box
        X = jnp.abs(x - self._c) - self._r
        dist = jnp.maximum(X, jnp.zeros_like(X))
        norm_const = jnp.log(math.sqrt(2 * math.pi) * self.sigma) + self._M
        return -0.5 * (dist / self.sigma) ** 2 - norm_const

    def sample(self, key, sample_shape=()):
        import jax

        u = jax.random.uniform(key, tuple(sample_shape) + self.a.shape, dtype=self.a.dtype)
        return self.a + (self.b - self.a) * u
