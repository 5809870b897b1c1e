"""LinearMean (reference: gpytorch/means/linear_mean.py:10)."""

from __future__ import annotations

import jax.numpy as jnp

from .mean import Mean


class LinearMean(Mean):
    def __init__(self, input_size: int, batch_shape=(), bias: bool = True, dtype=jnp.float32):
        super().__init__()
        self.batch_shape = tuple(batch_shape)
        self.register_parameter("weights", jnp.zeros(self.batch_shape + (input_size, 1), dtype=dtype))
        self.has_bias = bool(bias)
        if bias:
            self.register_parameter("bias", jnp.zeros(self.batch_shape + (1,), dtype=dtype))

    def forward(self, x):
        res = (x @ self.weights)[..., 0]
        if self.has_bias:
            res = res + self.bias
        return res
