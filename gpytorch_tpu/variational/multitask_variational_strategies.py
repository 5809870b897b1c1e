"""Multitask output wrappers over batched variational strategies.

Reference: gpytorch/variational/independent_multitask_variational_strategy.py:16 and
lmc_variational_strategy.py:37.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.module import Module
from ..distributions import MultitaskMultivariateNormal, MultivariateNormal
from ..linop import BlockInterleavedLinearOperator, DenseLinearOperator, KroneckerProductLinearOperator


class IndependentMultitaskVariationalStrategy(Module):
    """Batch-dim of the base strategy → independent tasks (reference :16)."""

    _pytree_ignore = ("_cache",)

    def __init__(self, base_variational_strategy, num_tasks: int, task_dim: int = -1):
        super().__init__()
        self.base_variational_strategy = base_variational_strategy
        self.num_tasks = int(num_tasks)
        self.task_dim = int(task_dim)

    @property
    def prior_distribution(self):
        return self.base_variational_strategy.prior_distribution

    def kl_divergence(self, model=None):
        return jnp.sum(self.base_variational_strategy.kl_divergence(model=model))

    def __call__(self, x, prior=False, task_indices=None, model=None, **kwargs):
        function_dist = self.base_variational_strategy(x, prior=prior, model=model, **kwargs)
        if task_indices is None:
            return MultitaskMultivariateNormal.from_batch_mvn(function_dist, task_dim=self.task_dim)
        # Hadamard case: pick one task per data point (reference :98-135)
        mean = function_dist.mean  # (..., t, n) with task batch at task_dim=-1 → (t, n)
        covar = function_dist.covariance_matrix  # (..., t, n, n)
        ti = jnp.asarray(task_indices).astype(jnp.int32)
        # gather per-point: mean over tasks at each point
        mean_sel = jnp.take_along_axis(jnp.moveaxis(mean, -2, -1), ti[..., :, None], axis=-1)[..., 0]
        n = mean.shape[-1]
        eye_sel = jax.nn.one_hot(ti, self.num_tasks, dtype=mean.dtype)  # (n, t)
        cov_sel = jnp.einsum("...tij,it,jt->...ij", covar, eye_sel, eye_sel)
        return MultivariateNormal(mean_sel, DenseLinearOperator(cov_sel))


class LMCVariationalStrategy(Module):
    """Linear model of coregionalisation: task outputs are learned linear combinations of
    latent GPs (reference: lmc_variational_strategy.py:37)."""

    _pytree_ignore = ("_cache",)

    def __init__(
        self,
        base_variational_strategy,
        num_tasks: int,
        num_latents: int = 1,
        latent_dim: int = -1,
        jitter_val: Optional[float] = None,
    ):
        super().__init__()
        self.base_variational_strategy = base_variational_strategy
        self.num_tasks = int(num_tasks)
        self.num_latents = int(num_latents)
        if latent_dim >= 0:
            raise RuntimeError(f"latent_dim must be negative, got {latent_dim}")
        self.latent_dim = int(latent_dim)
        dtype = base_variational_strategy.inducing_points.dtype
        batch_shape = tuple(base_variational_strategy._variational_distribution.batch_shape)
        # drop the latent dim from the lmc coefficient batch
        lmc_batch = tuple(s for i, s in enumerate(batch_shape) if i - len(batch_shape) != self.latent_dim)
        self.register_parameter(
            "lmc_coefficients",
            jax.random.normal(jax.random.PRNGKey(0), lmc_batch + (self.num_latents, self.num_tasks), dtype=dtype),
        )

    @property
    def prior_distribution(self):
        return self.base_variational_strategy.prior_distribution

    def kl_divergence(self, model=None):
        return jnp.sum(self.base_variational_strategy.kl_divergence(model=model))

    def __call__(self, x, prior=False, task_indices=None, model=None, **kwargs):
        latent_dist = self.base_variational_strategy(x, prior=prior, model=model, **kwargs)
        num_batch = len(latent_dist.batch_shape)
        latent_dim = num_batch + self.latent_dim

        # move the latent batch dim innermost
        mean = jnp.moveaxis(latent_dist.mean, latent_dim, -2)  # (..., q, n)
        covar = jnp.moveaxis(latent_dist.covariance_matrix, latent_dim, -3)  # (..., q, n, n)
        W = self.lmc_coefficients  # (..., q, t)

        # task means: (..., n, t) = Σ_q W[q,t] mean[q,n]
        task_mean = jnp.einsum("...qn,...qt->...nt", mean, W)
        # full covariance over (n, t): Σ_q covar_q ⊗ (w_q w_qᵀ), interleaved layout
        task_covar = jnp.einsum("...qij,...qt,...qs->...itjs", covar, W, W)
        n = mean.shape[-1]
        t = self.num_tasks
        task_covar = task_covar.reshape(task_covar.shape[:-4] + (n * t, n * t))
        jitter = self.base_variational_strategy.jitter_val
        task_covar = task_covar + jitter * jnp.eye(n * t, dtype=task_covar.dtype)
        dist = MultitaskMultivariateNormal(task_mean, DenseLinearOperator(task_covar), interleaved=True)
        if task_indices is None:
            return dist
        # Hadamard selection
        ti = jnp.asarray(task_indices).astype(jnp.int32)
        sel_mean = jnp.take_along_axis(task_mean, ti[..., :, None], axis=-1)[..., 0]
        onehot = jax.nn.one_hot(ti, t, dtype=task_mean.dtype)  # (n, t)
        big = task_covar.reshape(task_covar.shape[:-2] + (n, t, n, t))
        sel_cov = jnp.einsum("...itjs,it,js->...ij", big, onehot, onehot)
        return MultivariateNormal(sel_mean, DenseLinearOperator(sel_cov))
