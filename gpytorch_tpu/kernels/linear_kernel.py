"""LinearKernel and PolynomialKernel (reference: gpytorch/kernels/linear_kernel.py:20,
polynomial_kernel.py:12).  LinearKernel returns a low-rank RootLinearOperator so downstream
solves are O(n·d) via Woodbury (reference behavior; drives LinearPredictionStrategy)."""

from __future__ import annotations

import jax.numpy as jnp

from ..constraints import Positive
from ..linop import LinearOperator, LowRankRootLinearOperator, MatmulLinearOperator, RootLinearOperator
from .kernel import Kernel


class LinearKernel(Kernel):
    returns_lazy_structure = True
    def __init__(self, num_dimensions=None, offset_prior=None, variance_prior=None, variance_constraint=None, **kwargs):
        super().__init__(**kwargs)
        self.num_dimensions = num_dimensions
        self.register_parameter("raw_variance", jnp.zeros(self.batch_shape + (1,), dtype=self._param_dtype))
        self.register_constraint("raw_variance", variance_constraint or Positive())
        if variance_prior is not None:
            self.register_prior(
                "variance_prior",
                variance_prior,
                lambda m: m.variance,
                lambda m, v: m._set_constrained("raw_variance", v),
            )

    @property
    def variance(self):
        return self._constrained("raw_variance")

    @variance.setter
    def variance(self, value):
        self._set_constrained("raw_variance", value)

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        if last_dim_is_batch:
            x1 = jnp.swapaxes(x1, -1, -2)[..., None]
            x2 = jnp.swapaxes(x2, -1, -2)[..., None]
        v = self.variance  # (*batch, 1)
        x1_ = x1 * jnp.sqrt(v)[..., None]
        if diag:
            x2_ = x2 * jnp.sqrt(v)[..., None]
            return jnp.sum(x1_ * x2_, axis=-1)
        if x1 is x2 or (x1.shape == x2.shape):
            x2_ = x1_ if x1 is x2 else x2 * jnp.sqrt(v)[..., None]
            if x1 is x2:
                return RootLinearOperator(x1_)
            return MatmulLinearOperator(x1_, jnp.swapaxes(x2_, -1, -2))
        x2_ = x2 * jnp.sqrt(v)[..., None]
        return MatmulLinearOperator(x1_, jnp.swapaxes(x2_, -1, -2))

    def prediction_strategy(self, train_inputs, train_prior_dist, train_labels, likelihood):
        from ..models.exact_prediction_strategies import DefaultPredictionStrategy

        return DefaultPredictionStrategy(train_inputs, train_prior_dist, train_labels, likelihood)


class PolynomialKernel(Kernel):
    """k(x, x') = (x·x' + c)^p (reference: gpytorch/kernels/polynomial_kernel.py:12)."""

    def __init__(self, power: int = 2, offset_prior=None, offset_constraint=None, **kwargs):
        super().__init__(**kwargs)
        self.power = int(power)
        self.register_parameter("raw_offset", jnp.zeros(self.batch_shape + (1,), dtype=self._param_dtype))
        self.register_constraint("raw_offset", offset_constraint or Positive())
        if offset_prior is not None:
            self.register_prior(
                "offset_prior",
                offset_prior,
                lambda m: m.offset,
                lambda m, v: m._set_constrained("raw_offset", v),
            )

    @property
    def offset(self):
        return self._constrained("raw_offset")

    @offset.setter
    def offset(self, value):
        self._set_constrained("raw_offset", value)

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        if last_dim_is_batch:
            x1 = jnp.swapaxes(x1, -1, -2)[..., None]
            x2 = jnp.swapaxes(x2, -1, -2)[..., None]
        offset = self.offset
        if diag:
            prod = jnp.sum(x1 * x2, axis=-1)
            return jnp.power(prod + offset, self.power)
        prod = x1 @ jnp.swapaxes(x2, -1, -2)
        return jnp.power(prod + offset[..., None], self.power)
