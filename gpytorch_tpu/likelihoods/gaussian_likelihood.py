"""Gaussian likelihoods (reference: gpytorch/likelihoods/gaussian_likelihood.py:24-365)."""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import settings
from ..distributions import MultivariateNormal, Normal
from ..linop import DiagLinearOperator, LinearOperator
from .likelihood import Likelihood
from .noise_models import FixedGaussianNoise, HomoskedasticNoise


class _GaussianLikelihoodBase(Likelihood):
    """Reference: gaussian_likelihood.py:24."""

    def __init__(self, noise_covar):
        super().__init__()
        self.noise_covar = noise_covar

    def _shaped_noise_covar(self, base_shape, *params, **kwargs):
        return self.noise_covar(*params, shape=base_shape, **kwargs)

    def forward(self, function_samples: jax.Array, *params, **kwargs) -> Normal:
        noise = self._shaped_noise_covar(function_samples.shape, *params, **kwargs)._diagonal()
        noise = jnp.broadcast_to(noise, function_samples.shape)
        return Normal(function_samples, jnp.sqrt(noise))

    def log_marginal(self, observations, function_dist: MultivariateNormal, *params, **kwargs):
        marginal = self.marginal(function_dist, *params, **kwargs)
        ind = marginal.to_data_independent_dist() if isinstance(marginal, MultivariateNormal) else marginal
        return ind.log_prob(observations)

    def marginal(self, function_dist: MultivariateNormal, *params, **kwargs) -> MultivariateNormal:
        """N(μ, K + Σ_noise) (reference :117)."""
        mean = function_dist.loc
        covar = function_dist.lazy_covariance_matrix
        noise_covar = self._shaped_noise_covar(mean.shape, *params, **kwargs)
        full_covar = covar + noise_covar
        return MultivariateNormal(mean, full_covar)

    def expected_log_prob(self, target, function_dist: MultivariateNormal, *params, **kwargs):
        """Closed form (reference :44):
        E[log p(y|f)] = −½[(y−μ)² + Var(f)]/σ² − ½log(2πσ²) per point."""
        mean = function_dist.mean
        variance = function_dist.variance
        noise = self._shaped_noise_covar(mean.shape, *params, **kwargs)._diagonal()
        noise = jnp.broadcast_to(noise, mean.shape)
        res = ((target - mean) ** 2 + variance) / noise + jnp.log(noise) + math.log(2 * math.pi)
        return -0.5 * res


class GaussianLikelihood(_GaussianLikelihoodBase):
    """Homoskedastic Gaussian likelihood (reference :124)."""

    def __init__(self, noise_prior=None, noise_constraint=None, batch_shape=(), dtype=jnp.float32):
        super().__init__(HomoskedasticNoise(noise_prior, noise_constraint, batch_shape, dtype=dtype))

    @property
    def noise(self):
        return self.noise_covar.noise

    @noise.setter
    def noise(self, value):
        self.noise_covar.noise = value

    @property
    def raw_noise(self):
        return self.noise_covar.raw_noise

    @raw_noise.setter
    def raw_noise(self, value):
        self.noise_covar.raw_noise = jnp.asarray(value)


class GaussianLikelihoodWithMissingObs(GaussianLikelihood):
    """NaN-safe Gaussian likelihood (reference :183): missing targets are masked out of the
    marginal log prob via the identity-padding MaskedLinearOperator trick."""

    MISSING_VALUE_FILL = 0.0

    def marginal(self, function_dist, *params, **kwargs):
        return super().marginal(function_dist, *params, **kwargs)

    def log_marginal(self, observations, function_dist, *params, **kwargs):
        mask = ~jnp.isnan(observations)
        obs = jnp.where(mask, observations, jnp.zeros_like(observations))
        marginal = self.marginal(function_dist, *params, **kwargs)
        ind = marginal.to_data_independent_dist()
        lp = ind.log_prob(obs)
        return jnp.where(mask, lp, jnp.zeros_like(lp))

    def expected_log_prob(self, target, function_dist, *params, **kwargs):
        mask = ~jnp.isnan(target)
        tgt = jnp.where(mask, target, jnp.zeros_like(target))
        res = super().expected_log_prob(tgt, function_dist, *params, **kwargs)
        return jnp.where(mask, res, jnp.zeros_like(res))


class FixedNoiseGaussianLikelihood(_GaussianLikelihoodBase):
    """Known per-point observation noise (reference :245), with optional learned extra noise."""

    def __init__(self, noise, learn_additional_noise=False, batch_shape=(), dtype=jnp.float32):
        super().__init__(FixedGaussianNoise(noise))
        self.second_noise_covar = None
        if learn_additional_noise:
            self.second_noise_covar = HomoskedasticNoise(batch_shape=batch_shape, dtype=dtype)

    @property
    def noise(self):
        noise = self.noise_covar.noise
        if self.second_noise_covar is not None:
            noise = noise + jnp.broadcast_to(self.second_noise_covar.noise, noise.shape)
        return noise

    @noise.setter
    def noise(self, value):
        self.noise_covar.noise = jnp.asarray(value)

    @property
    def second_noise(self):
        if self.second_noise_covar is None:
            return 0.0
        return self.second_noise_covar.noise

    def get_fantasy_likelihood(self, **kwargs):
        """Fantasy likelihood with the new observations' noise appended
        (reference gaussian_likelihood.py:290-308 — raises without a ``noise`` kwarg)."""
        if "noise" not in kwargs:
            raise RuntimeError("FixedNoiseGaussianLikelihood.fantasize requires a `noise` kwarg")
        new_noise = jnp.asarray(kwargs["noise"])
        new = self.deepcopy()
        # expand the old noise to the NEW noise's batch shape before concatenating
        # (reference gaussian_likelihood.py:332-334), so a batched `noise` kwarg works
        old_noise = self.noise_covar.noise
        if new_noise.ndim > old_noise.ndim:
            old_noise = jnp.broadcast_to(old_noise, new_noise.shape[:-1] + old_noise.shape[-1:])
        new.noise_covar = FixedGaussianNoise(jnp.concatenate([old_noise, new_noise], axis=-1))
        return new

    def _shaped_noise_covar(self, base_shape, *params, **kwargs):
        res = self.noise_covar(*params, shape=base_shape, **kwargs)
        if self.second_noise_covar is not None:
            res = res + self.second_noise_covar(*params, shape=base_shape, **kwargs)
        if res.shape[-1] != base_shape[-1]:
            import warnings

            from ..utils.warnings import GPInputWarning

            warnings.warn(
                "You have passed data through a FixedNoiseGaussianLikelihood that did not match the size "
                "of the fixed noise, *and* you did not specify noise. This is treated as a no-noise prediction.",
                GPInputWarning,
            )
        return res


class DirichletClassificationLikelihood(FixedNoiseGaussianLikelihood):
    """GP classification via Dirichlet regression (reference :365)."""

    def __init__(self, targets, alpha_epsilon: float = 0.01, learn_additional_noise=False, batch_shape=(), dtype=jnp.float32):
        sigma2, transformed, num_classes = self._prepare_targets(jnp.asarray(targets), alpha_epsilon, dtype)
        super().__init__(noise=sigma2, learn_additional_noise=learn_additional_noise, batch_shape=batch_shape, dtype=dtype)
        self.transformed_targets = transformed
        self.num_classes = num_classes
        self.targets = jnp.asarray(targets)
        self.alpha_epsilon = alpha_epsilon

    @staticmethod
    def _prepare_targets(targets, alpha_epsilon=0.01, dtype=jnp.float32):
        num_classes = int(jnp.max(targets)) + 1
        alpha = alpha_epsilon * jnp.ones((targets.shape[-1], num_classes), dtype=dtype)
        idx = jnp.arange(targets.shape[-1])
        alpha = alpha.at[idx, targets.astype(jnp.int32)].add(1.0)
        sigma2_i = jnp.log(1.0 / alpha + 1.0)
        transformed = jnp.log(alpha) - 0.5 * sigma2_i
        return jnp.swapaxes(sigma2_i, -1, -2), jnp.swapaxes(transformed, -1, -2), num_classes

    def get_fantasy_likelihood(self, **kwargs):
        return self

    def __call__(self, input, *args, **kwargs):
        if "targets" in kwargs:
            targets = kwargs.pop("targets")
            dtype = self.transformed_targets.dtype
            sigma2, transformed, num_classes = self._prepare_targets(targets, self.alpha_epsilon, dtype)
            self.transformed_targets = transformed
            self.noise_covar = FixedGaussianNoise(sigma2)
        return super().__call__(input, *args, **kwargs)


class HadamardGaussianLikelihood(_GaussianLikelihoodBase):
    """Per-task noise selected by a task-index feature column
    (reference: gpytorch/likelihoods/hadamard_gaussian_likelihood.py:38)."""

    def __init__(self, num_tasks: int, noise_prior=None, noise_constraint=None, batch_shape=(), dtype=jnp.float32):
        from .noise_models import MultitaskHomoskedasticNoise

        super().__init__(MultitaskHomoskedasticNoise(num_tasks, noise_prior, noise_constraint, batch_shape, dtype=dtype))
        self.num_tasks = int(num_tasks)

    @property
    def task_noises(self):
        return self.noise_covar.noise

    def marginal(self, function_dist: MultivariateNormal, *params, **kwargs):
        """params = (task_indices,) with per-datapoint integer task ids."""
        mean, covar = function_dist.loc, function_dist.lazy_covariance_matrix
        if len(params) == 0:
            raise RuntimeError("HadamardGaussianLikelihood.marginal requires task_indices")
        task_idx = jnp.asarray(params[0]).astype(jnp.int32)
        if task_idx.ndim > 1:
            task_idx = task_idx[..., 0]
        noise = self.noise_covar.noise  # (*batch, num_tasks)
        point_noise = jnp.take(noise, task_idx, axis=-1)
        return MultivariateNormal(mean, covar + DiagLinearOperator(point_noise))
