"""HorseshoePrior (reference: gpytorch/priors/horseshoe_prior.py:15)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .prior import Prior


class HorseshoePrior(Prior):
    """Horseshoe density has no closed form; uses the tight bounds of
    Carvalho et al. 2010 (same approximation as the reference)."""

    def __init__(self, scale):
        super().__init__()
        self.register_buffer("scale", jnp.asarray(scale, dtype=jnp.result_type(float)))

    def log_prob(self, x):
        A, B = 0.5, 1.0  # bounds constants (reference)
        xx = (jnp.asarray(x) / self.scale) ** 2 / 2
        lb = A * jnp.log1p(1.0 / xx)
        ub = B * jnp.log1p(2.0 / xx)
        return jnp.log((lb + ub) / 2) - math.log(2 * math.pi ** (3 / 2)) - jnp.log(self.scale)

    def sample(self, key, sample_shape=()):
        k1, k2 = jax.random.split(key)
        shape = tuple(sample_shape) + self.scale.shape
        local = jnp.abs(jax.random.cauchy(k1, shape, dtype=self.scale.dtype))
        return jax.random.normal(k2, shape, dtype=self.scale.dtype) * local * self.scale
