"""Variational distributions q(u) (reference: gpytorch/variational/_variational_distribution.py:13,
cholesky_variational_distribution.py:12, mean_field_variational_distribution.py:12,
delta_variational_distribution.py:11)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import settings
from ..core.module import Module
from ..distributions import Delta, MultivariateNormal
from ..linop import CholLinearOperator, DiagLinearOperator, TriangularLinearOperator


class _VariationalDistribution(Module):
    def __init__(self, num_inducing_points: int, batch_shape=(), mean_init_std: float = 1e-3):
        super().__init__()
        self.num_inducing_points = int(num_inducing_points)
        self.batch_shape = tuple(batch_shape)
        self.mean_init_std = mean_init_std

    def forward(self) -> MultivariateNormal:
        raise NotImplementedError

    def shape(self):
        return self.batch_shape + (self.num_inducing_points,)

    def initialize_variational_distribution(self, prior_dist: MultivariateNormal, key=None) -> None:
        raise NotImplementedError

    def __call__(self) -> MultivariateNormal:
        return self.forward()


class CholeskyVariationalDistribution(_VariationalDistribution):
    """Full-covariance q(u) = N(m, L Lᵀ) (reference: cholesky_variational_distribution.py:12)."""

    def __init__(self, num_inducing_points: int, batch_shape=(), mean_init_std: float = 1e-3, dtype=jnp.float32):
        super().__init__(num_inducing_points, batch_shape, mean_init_std)
        m = self.num_inducing_points
        self.register_parameter("variational_mean", jnp.zeros(self.batch_shape + (m,), dtype=dtype))
        self.register_parameter(
            "chol_variational_covar", jnp.broadcast_to(jnp.eye(m, dtype=dtype), self.batch_shape + (m, m))
        )

    def forward(self) -> MultivariateNormal:
        chol = jnp.tril(self.chol_variational_covar)
        return MultivariateNormal(self.variational_mean, CholLinearOperator(chol))

    def initialize_variational_distribution(self, prior_dist: MultivariateNormal, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        mean = prior_dist.mean
        noise = self.mean_init_std * jax.random.normal(key, mean.shape, dtype=mean.dtype)
        self.variational_mean = jnp.broadcast_to(mean + noise, self.variational_mean.shape).astype(
            self.variational_mean.dtype
        )
        L = prior_dist.lazy_covariance_matrix.evaluate_kernel().cholesky().to_dense()
        self.chol_variational_covar = jnp.broadcast_to(L, self.chol_variational_covar.shape).astype(
            self.chol_variational_covar.dtype
        )

    def initialize(self, **kwargs):
        # bypass constrained-setter logic for matrix params
        return super().initialize(**kwargs)


class MeanFieldVariationalDistribution(_VariationalDistribution):
    """Diagonal q(u) (reference: mean_field_variational_distribution.py:12)."""

    def __init__(self, num_inducing_points: int, batch_shape=(), mean_init_std: float = 1e-3, dtype=jnp.float32):
        super().__init__(num_inducing_points, batch_shape, mean_init_std)
        m = self.num_inducing_points
        self.register_parameter("variational_mean", jnp.zeros(self.batch_shape + (m,), dtype=dtype))
        self.register_parameter("raw_variational_stddev", jnp.ones(self.batch_shape + (m,), dtype=dtype))

    @property
    def variational_stddev(self):
        return jnp.abs(self.raw_variational_stddev) + 1e-8

    def forward(self) -> MultivariateNormal:
        std = self.variational_stddev
        return MultivariateNormal(self.variational_mean, DiagLinearOperator(std**2))

    def initialize_variational_distribution(self, prior_dist: MultivariateNormal, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        mean = prior_dist.mean
        noise = self.mean_init_std * jax.random.normal(key, mean.shape, dtype=mean.dtype)
        self.variational_mean = jnp.broadcast_to(mean + noise, self.variational_mean.shape).astype(
            self.variational_mean.dtype
        )
        self.raw_variational_stddev = jnp.broadcast_to(
            jnp.sqrt(prior_dist.variance), self.raw_variational_stddev.shape
        ).astype(self.raw_variational_stddev.dtype)


class DeltaVariationalDistribution(_VariationalDistribution):
    """Point-estimate q(u) (reference: delta_variational_distribution.py:11)."""

    def __init__(self, num_inducing_points: int, batch_shape=(), mean_init_std: float = 1e-3, dtype=jnp.float32):
        super().__init__(num_inducing_points, batch_shape, mean_init_std)
        m = self.num_inducing_points
        self.register_parameter("variational_mean", jnp.zeros(self.batch_shape + (m,), dtype=dtype))

    def forward(self):
        return Delta(self.variational_mean)

    def initialize_variational_distribution(self, prior_dist: MultivariateNormal, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        mean = prior_dist.mean
        noise = self.mean_init_std * jax.random.normal(key, mean.shape, dtype=mean.dtype)
        self.variational_mean = jnp.broadcast_to(mean + noise, self.variational_mean.shape).astype(
            self.variational_mean.dtype
        )
