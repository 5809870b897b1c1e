"""ConstantMean (reference: gpytorch/means/constant_mean.py:33)."""

from __future__ import annotations

import jax.numpy as jnp

from .mean import Mean


class ConstantMean(Mean):
    def __init__(self, constant_prior=None, constant_constraint=None, batch_shape=(), dtype=jnp.float32):
        super().__init__()
        self.batch_shape = tuple(batch_shape)
        self.register_parameter("raw_constant", jnp.zeros(self.batch_shape, dtype=dtype))
        if constant_constraint is not None:
            self.register_constraint("raw_constant", constant_constraint)
        if constant_prior is not None:
            self.register_prior(
                "mean_prior",
                constant_prior,
                lambda m: m.constant,
                lambda m, v: m._set_constrained("raw_constant", v),
            )

    @property
    def constant(self):
        return self._constrained("raw_constant")

    @constant.setter
    def constant(self, value):
        self._set_constrained("raw_constant", value)

    def forward(self, x):
        shape = jnp.broadcast_shapes(self.batch_shape, x.shape[:-2]) + (x.shape[-2],)
        return jnp.broadcast_to(self.constant[..., None], shape).astype(x.dtype)
