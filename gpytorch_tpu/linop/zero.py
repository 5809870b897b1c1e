"""ZeroLinearOperator (reference: used by skip_posterior_variances,
gpytorch/models/exact_prediction_strategies.py:429)."""

from __future__ import annotations

import jax.numpy as jnp

from .base import LinearOperator


class ZeroLinearOperator(LinearOperator):
    def _is_known_psd(self) -> bool:
        return True  # the zero operator is (trivially) PSD

    def __init__(self, *shape, dtype=None):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        self._static_shape = tuple(int(s) for s in shape)
        self._static_dtype = jnp.dtype(dtype) if dtype is not None else jnp.dtype(jnp.float32)

    @property
    def dtype(self):
        return self._static_dtype

    def _shape(self):
        return self._static_shape

    def _matmul(self, rhs):
        out_shape = jnp.broadcast_shapes(self._static_shape[:-1], rhs.shape[:-2] + (self._static_shape[-2],))
        return jnp.zeros(out_shape + (rhs.shape[-1],), dtype=rhs.dtype)

    def _diagonal(self):
        return jnp.zeros(self._static_shape[:-2] + (min(self._static_shape[-2:]),), dtype=self._static_dtype)

    def _transpose(self):
        return ZeroLinearOperator(
            *(self._static_shape[:-2] + (self._static_shape[-1], self._static_shape[-2])), dtype=self._static_dtype
        )

    def to_dense(self):
        return jnp.zeros(self._static_shape, dtype=self._static_dtype)

    def __add__(self, other):
        if isinstance(other, LinearOperator):
            return other
        from .base import DenseLinearOperator

        return DenseLinearOperator(jnp.asarray(other))

    def __mul__(self, other):
        return self

    def add_diagonal(self, diag):
        from .diag import ConstantDiagLinearOperator, DiagLinearOperator

        diag = jnp.asarray(diag)
        n = self._static_shape[-1]
        if diag.ndim == 0:
            return ConstantDiagLinearOperator(diag[None], n)
        if diag.shape[-1] == 1:
            return ConstantDiagLinearOperator(diag, n)
        return DiagLinearOperator(jnp.broadcast_to(diag, diag.shape[:-1] + (n,)))
