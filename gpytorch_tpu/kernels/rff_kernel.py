"""RFFKernel — random Fourier features (reference: gpytorch/kernels/rff_kernel.py:13):
k(x,x') ≈ φ(x)ᵀφ(x') with φ(x) = [cos(xᵀω), sin(xᵀω)]/√D; returns a low-rank
RootLinearOperator so solves are O(n·D²) (drives LinearPredictionStrategy)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..linop import MatmulLinearOperator, RootLinearOperator
from .kernel import Kernel


class RFFKernel(Kernel):
    has_lengthscale = True
    returns_lazy_structure = True

    def __init__(self, num_samples: int, num_dims: Optional[int] = None, **kwargs):
        super().__init__(**kwargs)
        self.num_samples = int(num_samples)
        if num_dims is not None:
            self._init_weights(num_dims, self.num_samples)

    def _init_weights(self, num_dims=None, num_samples=None, randn_weights=None):
        if num_dims is not None and num_samples is not None:
            d = num_dims
            D = num_samples
        if randn_weights is None:
            randn_weights = jax.random.normal(
                jax.random.PRNGKey(0), self.batch_shape + (d, D), dtype=self._param_dtype
            )
        self.register_buffer("randn_weights", randn_weights)

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        if last_dim_is_batch:
            x1 = jnp.swapaxes(x1, -1, -2)[..., None]
            x2 = jnp.swapaxes(x2, -1, -2)[..., None]
        num_dims = x1.shape[-1]
        if not hasattr(self, "randn_weights"):
            self._init_weights(num_dims, self.num_samples)
        x1_eq_x2 = x1 is x2
        z1 = self._featurize(x1, normalize=False)
        z2 = z1 if x1_eq_x2 else self._featurize(x2, normalize=False)
        D = float(self.num_samples)
        if diag:
            return jnp.sum(z1 * z2, axis=-1) / D
        if x1_eq_x2:
            return RootLinearOperator(z1 / jnp.sqrt(D))
        return MatmulLinearOperator(z1 / D, jnp.swapaxes(z2, -1, -2))

    def _featurize(self, x, normalize: bool = False):
        # ω ~ N(0, 1/ℓ²): scale inputs by lengthscale then project
        proj = (x / self.lengthscale) @ self.randn_weights.astype(x.dtype)  # (..., n, D)
        z = jnp.concatenate([jnp.cos(proj), jnp.sin(proj)], axis=-1)  # (..., n, 2D)
        if normalize:
            z = z / jnp.sqrt(jnp.asarray(self.num_samples, x.dtype))
        return z

    def num_outputs_per_input(self, x1, x2):
        return 1

    def prediction_strategy(self, train_inputs, train_prior_dist, train_labels, likelihood):
        from ..models.exact_prediction_strategies import LinearPredictionStrategy

        return LinearPredictionStrategy(train_inputs, train_prior_dist, train_labels, likelihood)
