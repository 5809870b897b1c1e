"""ToeplitzLinearOperator (reference: linear_operator Toeplitz, used by GridKernel at
gpytorch/kernels/grid_kernel.py:152-159 for stationary kernels on regular grids)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.toeplitz import sym_toeplitz_matmul
from .base import LinearOperator


class ToeplitzLinearOperator(LinearOperator):
    """Symmetric Toeplitz matrix defined by its first column (..., n)."""

    def __init__(self, column):
        self.column = jnp.asarray(column)

    def _shape(self):
        n = self.column.shape[-1]
        return self.column.shape[:-1] + (n, n)

    def _matmul(self, rhs):
        return sym_toeplitz_matmul(self.column, rhs)

    def _t_matmul(self, rhs):
        return self._matmul(rhs)

    def _transpose(self):
        return self

    def _diagonal(self):
        n = self.column.shape[-1]
        return jnp.broadcast_to(self.column[..., :1], self.column.shape[:-1] + (n,))

    def to_dense(self):
        n = self.column.shape[-1]
        i = jnp.arange(n)
        idx = jnp.abs(i[:, None] - i[None, :])
        return jnp.take(self.column, idx, axis=-1)

    def _get_rows(self, idx):
        n = self.column.shape[-1]
        idx = jnp.broadcast_to(idx, self.column.shape[:-1] + idx.shape[-1:])
        j = jnp.arange(n)
        gather = jnp.abs(idx[..., :, None] - j)  # (..., m, n)
        col = jnp.broadcast_to(self.column[..., None, :], gather.shape)
        return jnp.take_along_axis(col, gather, axis=-1)
