"""ZeroMean (reference: gpytorch/means/zero_mean.py)."""

from __future__ import annotations

import jax.numpy as jnp

from .mean import Mean


class ZeroMean(Mean):
    def __init__(self, batch_shape=(), dtype=jnp.float32):
        super().__init__()
        self.batch_shape = tuple(batch_shape)
        self._param_dtype = jnp.dtype(dtype)

    def forward(self, x):
        shape = jnp.broadcast_shapes(self.batch_shape, x.shape[:-2]) + (x.shape[-2],)
        return jnp.zeros(shape, dtype=x.dtype)
