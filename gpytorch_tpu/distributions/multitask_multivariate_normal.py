"""MultitaskMultivariateNormal (reference: gpytorch/distributions/
multitask_multivariate_normal.py:17) — an MVN over (n × t) outputs with interleaved or
block layout on a flattened n·t event dimension."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..linop import (
    BlockDiagLinearOperator,
    BlockInterleavedLinearOperator,
    CatLinearOperator,
    DenseLinearOperator,
    LinearOperator,
    to_linear_operator,
)
from .multivariate_normal import MultivariateNormal


class MultitaskMultivariateNormal(MultivariateNormal):
    def __init__(self, mean, covariance_matrix, validate_args: bool = False, interleaved: bool = True):
        """mean: (..., n, t); covariance: (..., n·t, n·t) operator."""
        mean = jnp.asarray(mean)
        if mean.ndim < 2:
            raise ValueError("MultitaskMultivariateNormal mean must be (..., n, t)")
        self._output_shape = mean.shape
        self.interleaved = bool(interleaved)
        if self.interleaved:
            flat_mean = mean.reshape(mean.shape[:-2] + (-1,))
        else:
            flat_mean = jnp.swapaxes(mean, -1, -2).reshape(mean.shape[:-2] + (-1,))
        super().__init__(flat_mean, covariance_matrix, validate_args=validate_args)

    @property
    def num_tasks(self) -> int:
        return self._output_shape[-1]

    @property
    def event_shape(self) -> Tuple[int, ...]:
        return self._output_shape[-2:]

    def _flat_to_task(self, flat: jax.Array) -> jax.Array:
        n, t = self._output_shape[-2:]
        if self.interleaved:
            return flat.reshape(flat.shape[:-1] + (n, t))
        return jnp.swapaxes(flat.reshape(flat.shape[:-1] + (t, n)), -1, -2)

    def _task_to_flat(self, arr: jax.Array) -> jax.Array:
        if self.interleaved:
            return arr.reshape(arr.shape[:-2] + (-1,))
        return jnp.swapaxes(arr, -1, -2).reshape(arr.shape[:-2] + (-1,))

    @property
    def mean(self) -> jax.Array:
        return self._flat_to_task(jnp.broadcast_to(self.loc, self.batch_shape + (self.loc.shape[-1],)))

    @property
    def variance(self) -> jax.Array:
        diag = self._covar._diagonal()
        diag = jnp.broadcast_to(diag, self.batch_shape + (self.loc.shape[-1],))
        from .. import settings

        min_var = settings.min_variance.value(diag.dtype)
        diag = jnp.where(diag < min_var, jnp.full_like(diag, min_var), diag)
        return self._flat_to_task(diag)

    def log_prob(self, value: jax.Array, key=None, solver_config=None) -> jax.Array:
        return super().log_prob(self._task_to_flat(value), key=key, solver_config=solver_config)

    def rsample(self, key, sample_shape=()):
        flat = MultivariateNormal(self.loc, self._covar).rsample(key, sample_shape)
        return self._flat_to_task(flat)

    def expand(self, batch_shape):
        batch_shape = tuple(batch_shape)
        mvn = MultivariateNormal(self.loc, self._covar).expand(batch_shape)
        new = object.__new__(MultitaskMultivariateNormal)
        new.loc = mvn.loc
        new._covar = mvn._covar
        new._output_shape = batch_shape + self._output_shape[-2:]
        new.interleaved = self.interleaved
        return new

    def to_data_independent_dist(self):
        """Reference: multitask_multivariate_normal.py:255 — diagonalize across data."""
        from .normal import Normal

        return Normal(self.mean, jnp.sqrt(self.variance))

    @classmethod
    def from_batch_mvn(cls, batch_mvn: MultivariateNormal, task_dim: int = -1) -> "MultitaskMultivariateNormal":
        """Interpret a batch dim of an MVN as the task dim (reference :87)."""
        if task_dim not in (-1, batch_mvn.mean.ndim - 2):
            # move the chosen batch dim to be the innermost batch dim
            nd = len(batch_mvn.batch_shape)
            task_dim = task_dim if task_dim >= 0 else nd + task_dim
            mean = jnp.moveaxis(batch_mvn.mean, task_dim, -2)
            covar = DenseLinearOperator(jnp.moveaxis(batch_mvn.covariance_matrix, task_dim, -3))
        else:
            mean = batch_mvn.mean
            covar = batch_mvn.lazy_covariance_matrix
        # mean: (..., t, n) → (..., n, t)
        task_mean = jnp.swapaxes(mean, -1, -2)
        block = BlockInterleavedLinearOperator(covar)
        return cls(task_mean, block, interleaved=True)

    @classmethod
    def from_independent_mvns(cls, mvns) -> "MultitaskMultivariateNormal":
        """Stack independent MVNs as tasks (reference :127)."""
        means = jnp.stack([m.mean for m in mvns], axis=-1)  # (..., n, t)
        covs = jnp.stack([m.covariance_matrix for m in mvns], axis=-3)  # (..., t, n, n)
        block = BlockInterleavedLinearOperator(DenseLinearOperator(covs))
        return cls(means, block, interleaved=True)

    @classmethod
    def from_repeated_mvn(cls, mvn: MultivariateNormal, num_tasks: int) -> "MultitaskMultivariateNormal":
        return cls.from_independent_mvns([mvn] * num_tasks)

    def __repr__(self):
        return f"MultitaskMultivariateNormal(batch={self.batch_shape}, event={self.event_shape})"
