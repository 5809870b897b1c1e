"""Diagonal operators (reference: linear_operator Diag/ConstantDiag/Identity, used at e.g.
gpytorch/likelihoods/noise_models.py, multitask_gaussian_likelihood.py:122)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .base import DenseLinearOperator, LinearOperator

Array = jax.Array


class DiagLinearOperator(LinearOperator):
    """diag(d) with d of shape (..., n)."""

    def __init__(self, diag):
        self.diag = jnp.asarray(diag)

    def _diag_values(self) -> Array:
        return self.diag

    def _eig_lower_bound(self) -> Array:
        return jnp.min(self.diag, axis=-1)  # eigenvalues ARE the diagonal

    def _shape(self):
        return self.diag.shape + (self.diag.shape[-1],)

    def _matmul(self, rhs):
        return self.diag[..., :, None] * rhs

    def _t_matmul(self, rhs):
        return self._matmul(rhs)

    def _transpose(self):
        return self

    def _diagonal(self):
        return self.diag

    def to_dense(self):
        n = self.shape[-1]
        return jnp.eye(n, dtype=self.diag.dtype) * self.diag[..., None, :]

    def _get_rows(self, idx):
        n = self.shape[-1]
        idx = jnp.broadcast_to(idx, self.diag.shape[:-1] + idx.shape[-1:])
        rows = (idx[..., :, None] == jnp.arange(n)).astype(self.diag.dtype)
        vals = jnp.take_along_axis(self.diag, idx, axis=-1)
        return rows * vals[..., :, None]

    def add_diagonal(self, diag):
        diag = jnp.asarray(diag, dtype=self.dtype)
        if diag.ndim == 0:
            diag = diag[None]
        return DiagLinearOperator(self.diag + diag)

    def __add__(self, other):
        if isinstance(other, DiagLinearOperator):
            return DiagLinearOperator(self.diag + other._diag_values())
        if isinstance(other, LinearOperator):
            return other.add_diagonal(self.diag)
        return super().__add__(other)

    def __mul__(self, other):
        if isinstance(other, DiagLinearOperator):
            return DiagLinearOperator(self.diag * other._diag_values())
        if not isinstance(other, LinearOperator):
            other = jnp.asarray(other)
            if other.ndim == 0 or other.shape[-1] == 1:
                return DiagLinearOperator(self.diag * jnp.squeeze(other, axis=-1) if other.ndim > 0 else self.diag * other)
        return super().__mul__(other)

    def cholesky(self, upper: bool = False):
        return DiagLinearOperator(jnp.sqrt(self.diag))

    def sqrt(self):
        return DiagLinearOperator(jnp.sqrt(self.diag))

    def inverse(self):
        return DiagLinearOperator(1.0 / self.diag)

    def solve(self, rhs, lhs=None):
        rhs = jnp.asarray(rhs)
        if rhs.ndim == 1:
            res = rhs / self.diag
        else:
            res = rhs / self.diag[..., :, None]
        if lhs is not None:
            res = lhs @ res
        return res

    def inv_quad_logdet(self, inv_quad_rhs=None, logdet=False, reduce_inv_quad=True, key=None, config=None,
                        solver_state=None, return_state=False):
        if return_state:  # closed-form solve: warm-start state passes through untouched
            res = self.inv_quad_logdet(inv_quad_rhs, logdet, reduce_inv_quad, key, config)
            return res, solver_state
        logdet_term = jnp.sum(jnp.log(self.diag), axis=-1) if logdet else None
        iq = None
        if inv_quad_rhs is not None:
            rhs = inv_quad_rhs if inv_quad_rhs.ndim > 1 else inv_quad_rhs[:, None]
            iq = jnp.sum(rhs * rhs / self.diag[..., :, None], axis=-2)
            if reduce_inv_quad:
                iq = jnp.sum(iq, axis=-1)
        return iq, logdet_term

    def logdet(self):
        return jnp.sum(jnp.log(self.diag), axis=-1)

    def root_decomposition(self, method: Optional[str] = None):
        from .root import RootLinearOperator

        return RootLinearOperator(self.sqrt().to_dense())

    def root_inv_decomposition(self, initial_vectors=None, test_vectors=None, method=None):
        from .root import RootLinearOperator

        return RootLinearOperator(DiagLinearOperator(jnp.sqrt(1.0 / self.diag)).to_dense())

    def zero_mean_mvn_samples(self, key, num_samples):
        base = jax.random.normal(key, (num_samples,) + self.diag.shape, dtype=self.diag.dtype)
        return base * jnp.sqrt(self.diag)

    def __getitem__(self, index):
        return DenseLinearOperator(self.to_dense()[index])


class ConstantDiagLinearOperator(DiagLinearOperator):
    """c·I with c of shape (..., 1) (reference: multitask σ²I at
    gpytorch/likelihoods/multitask_gaussian_likelihood.py:122)."""

    def __init__(self, value, diag_shape: int):
        self.value = jnp.asarray(value)  # (..., 1)
        self._diag_shape = int(diag_shape)

    @property
    def diag(self) -> Array:
        return jnp.broadcast_to(self.value, self.value.shape[:-1] + (self._diag_shape,))

    def _diag_values(self):
        return self.diag

    def _shape(self):
        return self.value.shape[:-1] + (self._diag_shape, self._diag_shape)

    def _matmul(self, rhs):
        return self.value[..., :, None] * rhs

    def inverse(self):
        return ConstantDiagLinearOperator(1.0 / self.value, self._diag_shape)

    def sqrt(self):
        return ConstantDiagLinearOperator(jnp.sqrt(self.value), self._diag_shape)

    def logdet(self):
        return self._diag_shape * jnp.log(self.value[..., 0])


class IdentityLinearOperator(ConstantDiagLinearOperator):
    def _is_known_psd(self) -> bool:
        return True

    def __init__(self, diag_shape: int, dtype=jnp.float32, batch_shape: Tuple[int, ...] = ()):
        super().__init__(jnp.ones(tuple(batch_shape) + (1,), dtype=dtype), diag_shape)

    def _matmul(self, rhs):
        return jnp.broadcast_to(rhs, jnp.broadcast_shapes(self.batch_shape + rhs.shape[-2:], rhs.shape))

    def solve(self, rhs, lhs=None):
        return rhs if lhs is None else lhs @ rhs

    def logdet(self):
        return jnp.zeros(self.batch_shape, dtype=self.dtype)
