"""Delta (point-mass) distribution (reference: gpytorch/distributions/delta.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .distribution import Distribution


class Delta(Distribution):
    def __init__(self, v, log_density=None, event_dim: int = 1):
        self.v = jnp.asarray(v)
        self.event_dim = int(event_dim)

    @property
    def mean(self):
        return self.v

    @property
    def variance(self):
        return jnp.zeros_like(self.v)

    @property
    def batch_shape(self):
        return self.v.shape[: self.v.ndim - self.event_dim]

    @property
    def event_shape(self):
        return self.v.shape[self.v.ndim - self.event_dim :]

    def log_prob(self, value):
        eq = jnp.all(value == self.v, axis=tuple(range(-self.event_dim, 0))) if self.event_dim else value == self.v
        return jnp.where(eq, jnp.zeros_like(self.v, shape=self.batch_shape), -jnp.inf)

    def rsample(self, key, sample_shape=()):
        return jnp.broadcast_to(self.v, tuple(sample_shape) + self.v.shape)
