"""Noise covariance models (reference: gpytorch/likelihoods/noise_models.py:95-150)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import settings
from ..constraints import GreaterThan
from ..core.module import Module
from ..linop import ConstantDiagLinearOperator, DiagLinearOperator


class Noise(Module):
    """Abstract base for noise-covariance modules (reference: noise_models.py:20)."""

    def forward(self, *params, shape=None):
        raise NotImplementedError

    def __call__(self, *params, shape=None, **kwargs):
        return self.forward(*params, shape=shape, **kwargs)


class _HomoskedasticNoiseBase(Noise):
    def __init__(self, noise_prior=None, noise_constraint=None, batch_shape=(), num_tasks=1, dtype=jnp.float32):
        super().__init__()
        self.batch_shape = tuple(batch_shape)
        self.num_tasks = int(num_tasks)
        if noise_constraint is None:
            noise_constraint = GreaterThan(1e-4)
        self.register_parameter("raw_noise", jnp.zeros(self.batch_shape + (num_tasks,), dtype=dtype))
        self.register_constraint("raw_noise", noise_constraint)
        if noise_prior is not None:
            self.register_prior(
                "noise_prior",
                noise_prior,
                lambda m: m.noise,
                lambda m, v: m._set_noise(v),
            )

    @property
    def noise(self):
        return self._constrained("raw_noise")

    @noise.setter
    def noise(self, value):
        self._set_noise(value)

    def _set_noise(self, value):
        self._set_constrained("raw_noise", value)

    def forward(self, *params, shape=None):
        """Return the noise covariance as a Diag operator over n points."""
        if shape is None:
            p = params[0] if isinstance(params[0], jax.Array) else params[0][0]
            shape = p.shape[:-1] if p.ndim > 1 else p.shape
        n = shape[-1]
        noise = self.noise  # (*batch, num_tasks)
        if self.num_tasks == 1:
            return ConstantDiagLinearOperator(noise, n)
        # per-task noise replicated across data (interleaved layout)
        full = jnp.reshape(
            jnp.broadcast_to(noise[..., None, :], noise.shape[:-1] + (n, self.num_tasks)),
            noise.shape[:-1] + (n * self.num_tasks,),
        )
        return DiagLinearOperator(full)

    def __call__(self, *params, shape=None):
        return self.forward(*params, shape=shape)


class HomoskedasticNoise(_HomoskedasticNoiseBase):
    """σ²I (reference: noise_models.py:95)."""

    def __init__(self, noise_prior=None, noise_constraint=None, batch_shape=(), dtype=jnp.float32):
        super().__init__(noise_prior, noise_constraint, batch_shape, num_tasks=1, dtype=dtype)


class MultitaskHomoskedasticNoise(_HomoskedasticNoiseBase):
    """Per-task σ²ᵗI (reference: noise_models.py:102)."""

    def __init__(self, num_tasks, noise_prior=None, noise_constraint=None, batch_shape=(), dtype=jnp.float32):
        super().__init__(noise_prior, noise_constraint, batch_shape, num_tasks=num_tasks, dtype=dtype)


class HeteroskedasticNoise(Noise):
    """Noise modeled by a second GP/NN over inputs (reference: noise_models.py:109)."""

    def __init__(self, noise_model, noise_indices=None, noise_constraint=None):
        super().__init__()
        self.noise_model = noise_model
        self.noise_indices = noise_indices
        from ..constraints import GreaterThan as _GT

        self._noise_constraint = noise_constraint or _GT(1e-4)

    def forward(self, *params, shape=None):
        training = self.noise_model.training
        self.noise_model.eval()
        try:
            output = self.noise_model(*params)
        finally:
            self.noise_model.train(training)
        from ..distributions import MultivariateNormal

        if not isinstance(output, MultivariateNormal):
            raise RuntimeError("noise_model must return a MultivariateNormal")
        log_noise = output.mean if self.noise_indices is None else output.mean[..., self.noise_indices]
        return DiagLinearOperator(self._noise_constraint.transform(log_noise))

    def __call__(self, *params, shape=None):
        return self.forward(*params, shape=shape)


class FixedGaussianNoise(Noise):
    """User-supplied per-point noise (reference: noise_models.py:145)."""

    def __init__(self, noise):
        super().__init__()
        self.noise = jnp.asarray(noise)

    def forward(self, *params, shape=None, noise=None):
        from .. import settings

        def _clamp(v):
            # settings.min_fixed_noise (reference settings.py:284): user-supplied noise
            # below the dtype floor destabilizes the K̂ solves — clamp, as the reference
            # FixedNoiseGaussianLikelihood does.
            v = jnp.asarray(v)
            return jnp.maximum(v, jnp.asarray(settings.min_fixed_noise.value(v.dtype), v.dtype))

        if noise is not None:
            return DiagLinearOperator(_clamp(noise))
        if shape is None or shape[-1] == self.noise.shape[-1]:
            return DiagLinearOperator(_clamp(self.noise))
        from ..linop import ZeroLinearOperator

        return ZeroLinearOperator(*(tuple(shape) + (shape[-1],)), dtype=self.noise.dtype)

    def __call__(self, *params, shape=None, noise=None):
        return self.forward(*params, shape=shape, noise=noise)
