"""Derivative-GP means (reference: gpytorch/means/constant_mean_grad.py:10,
constant_mean_gradgrad.py:13, linear_mean_grad.py, linear_mean_gradgrad.py).

These pair with RBFKernelGrad / RBFKernelGradGrad: outputs per input are (1+d) or (1+d+d)."""

from __future__ import annotations

import jax.numpy as jnp

from .mean import Mean


class ConstantMeanGrad(Mean):
    def __init__(self, batch_shape=(), dtype=jnp.float32):
        super().__init__()
        self.batch_shape = tuple(batch_shape)
        self.register_parameter("raw_constant", jnp.zeros(self.batch_shape + (1,), dtype=dtype))

    @property
    def constant(self):
        return self.raw_constant

    def forward(self, x):
        d = x.shape[-1]
        shape = jnp.broadcast_shapes(self.batch_shape, x.shape[:-2]) + (x.shape[-2], d + 1)
        mean = jnp.zeros(shape, dtype=x.dtype)
        mean = mean.at[..., 0].set(jnp.broadcast_to(self.raw_constant, mean.shape[:-1]))
        return mean


class ConstantMeanGradGrad(Mean):
    def __init__(self, batch_shape=(), dtype=jnp.float32):
        super().__init__()
        self.batch_shape = tuple(batch_shape)
        self.register_parameter("raw_constant", jnp.zeros(self.batch_shape + (1,), dtype=dtype))

    def forward(self, x):
        d = x.shape[-1]
        shape = jnp.broadcast_shapes(self.batch_shape, x.shape[:-2]) + (x.shape[-2], 2 * d + 1)
        mean = jnp.zeros(shape, dtype=x.dtype)
        mean = mean.at[..., 0].set(jnp.broadcast_to(self.raw_constant, mean.shape[:-1]))
        return mean


class LinearMeanGrad(Mean):
    def __init__(self, input_size: int, batch_shape=(), bias: bool = True, dtype=jnp.float32):
        super().__init__()
        self.batch_shape = tuple(batch_shape)
        self.register_parameter("weights", jnp.zeros(self.batch_shape + (input_size, 1), dtype=dtype))
        self.has_bias = bool(bias)
        if bias:
            self.register_parameter("bias", jnp.zeros(self.batch_shape + (1,), dtype=dtype))

    def forward(self, x):
        val = (x @ self.weights)  # (..., n, 1)
        if self.has_bias:
            val = val + self.bias[..., None, :]
        dval = jnp.broadcast_to(self.weights[..., None, :, 0], x.shape)  # (..., n, d)
        return jnp.concatenate([val, dval], axis=-1)


class LinearMeanGradGrad(Mean):
    def __init__(self, input_size: int, batch_shape=(), bias: bool = True, dtype=jnp.float32):
        super().__init__()
        self.batch_shape = tuple(batch_shape)
        self.register_parameter("weights", jnp.zeros(self.batch_shape + (input_size, 1), dtype=dtype))
        self.has_bias = bool(bias)
        if bias:
            self.register_parameter("bias", jnp.zeros(self.batch_shape + (1,), dtype=dtype))

    def forward(self, x):
        val = x @ self.weights
        if self.has_bias:
            val = val + self.bias[..., None, :]
        d = x.shape[-1]
        dval = jnp.broadcast_to(self.weights[..., None, :, 0], x.shape)
        ddval = jnp.zeros_like(dval)
        return jnp.concatenate([val, dval, ddval], axis=-1)
