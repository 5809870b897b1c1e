"""MultitaskGaussianLikelihood (reference:
gpytorch/likelihoods/multitask_gaussian_likelihood.py:162): per-task noise with optional
low-rank inter-task noise correlations (LKJ-capable, :67), plus optional global noise.
Noise covariance is I_n ⊗ Σ_task in the interleaved layout (:129-134)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..constraints import GreaterThan
from ..distributions import MultitaskMultivariateNormal, MultivariateNormal, Normal
from ..linop import (
    ConstantDiagLinearOperator,
    DenseLinearOperator,
    DiagLinearOperator,
    IdentityLinearOperator,
    KroneckerProductLinearOperator,
)
from .likelihood import Likelihood


class _MultitaskGaussianLikelihoodBase(Likelihood):
    """Base marker for multitask Gaussian likelihoods (reference:
    multitask_gaussian_likelihood.py:24) — downstream code isinstance-checks this name."""


class MultitaskGaussianLikelihood(_MultitaskGaussianLikelihoodBase):
    def __init__(
        self,
        num_tasks: int,
        rank: int = 0,
        batch_shape=(),
        task_prior=None,
        noise_prior=None,
        noise_constraint=None,
        has_global_noise: bool = True,
        has_task_noise: bool = True,
        dtype=jnp.float32,
    ):
        super().__init__()
        if noise_constraint is None:
            noise_constraint = GreaterThan(1e-4)
        if not has_task_noise and not has_global_noise:
            raise ValueError("At least one of has_task_noise or has_global_noise must be True")
        self.num_tasks = int(num_tasks)
        self.rank = int(rank)
        self.batch_shape = tuple(batch_shape)
        self.has_global_noise = bool(has_global_noise)
        self.has_task_noise = bool(has_task_noise)

        if has_task_noise:
            if rank == 0:
                self.register_parameter("raw_task_noises", jnp.zeros(self.batch_shape + (num_tasks,), dtype=dtype))
                self.register_constraint("raw_task_noises", noise_constraint)
            else:
                self.register_parameter(
                    "task_noise_covar_factor",
                    jax.random.normal(
                        jax.random.PRNGKey(0), self.batch_shape + (num_tasks, rank), dtype=dtype
                    ),
                )
                if task_prior is not None:
                    self.register_prior("MultitaskErrorCovariancePrior", task_prior, lambda m: m._eval_covar_matrix(), None)
        if has_global_noise:
            self.register_parameter("raw_noise", jnp.zeros(self.batch_shape + (1,), dtype=dtype))
            self.register_constraint("raw_noise", noise_constraint)

    @property
    def noise(self):
        return self._constrained("raw_noise")

    @noise.setter
    def noise(self, value):
        self._set_constrained("raw_noise", value)

    @property
    def task_noises(self):
        if self.rank != 0:
            raise RuntimeError("Cannot read task_noises when rank > 0")
        return self._constrained("raw_task_noises")

    @task_noises.setter
    def task_noises(self, value):
        self._set_constrained("raw_task_noises", value)

    def _eval_covar_matrix(self):
        cf = self.task_noise_covar_factor
        eps = 1e-4
        return cf @ jnp.swapaxes(cf, -1, -2) + eps * jnp.eye(self.num_tasks, dtype=cf.dtype)

    def _task_covar(self, dtype):
        if self.has_task_noise:
            if self.rank == 0:
                task = DiagLinearOperator(self.task_noises)
            else:
                task = DenseLinearOperator(self._eval_covar_matrix())
        else:
            task = None
        return task

    def _shaped_noise_covar(self, shape, *params, **kwargs):
        """Noise covariance over the flattened interleaved (n·t) dimension."""
        n = shape[-1] // self.num_tasks
        dtype = self.raw_noise.dtype if self.has_global_noise else self.task_noise_covar_factor.dtype
        task = self._task_covar(dtype)
        if task is not None:
            eye_n = IdentityLinearOperator(n, dtype=dtype, batch_shape=self.batch_shape)
            kron = KroneckerProductLinearOperator(eye_n, task)
            if self.has_global_noise:
                # Kron + σ²I keeps the closed-form eig solve path
                return kron.add_diagonal(self.noise)
            return kron
        return ConstantDiagLinearOperator(self.noise, shape[-1])

    def marginal(self, function_dist: MultitaskMultivariateNormal, *params, **kwargs):
        mean = function_dist.loc
        covar = function_dist.lazy_covariance_matrix
        noise = self._shaped_noise_covar(mean.shape, *params, **kwargs)
        out = covar + noise
        return MultitaskMultivariateNormal(
            function_dist.mean, out, interleaved=function_dist.interleaved
        )

    def _noise_diag(self, mean_shape):
        """Diagonal of the noise covariance reshaped to (..., n, t)."""
        n_times_t = mean_shape[-2] * mean_shape[-1]
        diag = self._shaped_noise_covar(mean_shape[:-2] + (n_times_t,))._diagonal()
        return diag.reshape(diag.shape[:-1] + (mean_shape[-2], self.num_tasks))

    def expected_log_prob(self, target, function_dist: MultitaskMultivariateNormal, *params, **kwargs):
        import math

        mean = function_dist.mean  # (..., n, t)
        variance = function_dist.variance
        noise = self._noise_diag(mean.shape)
        res = ((target - mean) ** 2 + variance) / noise + jnp.log(noise) + math.log(2 * math.pi)
        return -0.5 * res

    def forward(self, function_samples: jax.Array, *params, **kwargs) -> Normal:
        noise = self._noise_diag(function_samples.shape)
        return Normal(function_samples, jnp.sqrt(jnp.broadcast_to(noise, function_samples.shape)))

    def log_marginal(self, observations, function_dist, *params, **kwargs):
        marginal = self.marginal(function_dist, *params, **kwargs)
        ind = marginal.to_data_independent_dist()
        return ind.log_prob(observations)
