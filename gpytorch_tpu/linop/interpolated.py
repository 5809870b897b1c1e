"""InterpolatedLinearOperator — W_left K W_rightᵀ (SKI/KISS-GP).

Reference: linear_operator InterpolatedLinearOperator as returned by
gpytorch/kernels/grid_interpolation_kernel.py:199-206.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.interp import left_interp, left_t_interp
from .base import DenseLinearOperator, LinearOperator, to_linear_operator


class InterpolatedLinearOperator(LinearOperator):
    def __init__(
        self,
        base: LinearOperator,
        left_interp_indices,
        left_interp_values,
        right_interp_indices=None,
        right_interp_values=None,
    ):
        self.base = to_linear_operator(base)
        self.left_interp_indices = jnp.asarray(left_interp_indices)
        self.left_interp_values = jnp.asarray(left_interp_values)
        self.right_interp_indices = (
            self.left_interp_indices if right_interp_indices is None else jnp.asarray(right_interp_indices)
        )
        self.right_interp_values = (
            self.left_interp_values if right_interp_values is None else jnp.asarray(right_interp_values)
        )

    def _shape(self):
        batch = jnp.broadcast_shapes(
            self.base.batch_shape, self.left_interp_indices.shape[:-2], self.right_interp_indices.shape[:-2]
        )
        return tuple(batch) + (self.left_interp_indices.shape[-2], self.right_interp_indices.shape[-2])

    def _matmul(self, rhs):
        m = self.base.shape[-1]
        tmp = left_t_interp(self.right_interp_indices, self.right_interp_values, rhs, m)
        tmp = self.base.matmul(tmp)
        return left_interp(self.left_interp_indices, self.left_interp_values, tmp)

    def _t_matmul(self, rhs):
        m = self.base.shape[-2]
        tmp = left_t_interp(self.left_interp_indices, self.left_interp_values, rhs, m)
        tmp = self.base._t_matmul(tmp)
        return left_interp(self.right_interp_indices, self.right_interp_values, tmp)

    def _transpose(self):
        return InterpolatedLinearOperator(
            self.base._transpose(),
            self.right_interp_indices,
            self.right_interp_values,
            self.left_interp_indices,
            self.left_interp_values,
        )

    def _diagonal(self):
        # diag[i] = w_lᵢᵀ K w_rᵢ — gather the small q×q base blocks per point
        Kb = self.base.to_dense()
        li, lv = self.left_interp_indices, self.left_interp_values
        ri, rv = self.right_interp_indices, self.right_interp_values

        def _single(Kd, li_, lv_, ri_, rv_):
            # (n, q, q) block gather
            blocks = Kd[li_[..., :, None], ri_[..., None, :]]
            return jnp.einsum("nq,nqp,np->n", lv_, blocks, rv_)

        batch = self.batch_shape
        Kb = jnp.broadcast_to(Kb, batch + Kb.shape[-2:])
        li = jnp.broadcast_to(li, batch + li.shape[-2:])
        lv = jnp.broadcast_to(lv, batch + lv.shape[-2:])
        ri = jnp.broadcast_to(ri, batch + ri.shape[-2:])
        rv = jnp.broadcast_to(rv, batch + rv.shape[-2:])
        fn = _single
        for _ in range(len(batch)):
            fn = jax.vmap(fn)
        return fn(Kb, li, lv, ri, rv)

    def to_dense(self):
        m = self.base.shape[-1]
        n_right = self.right_interp_indices.shape[-2]
        eye = jnp.eye(n_right, dtype=self.dtype)
        eye = jnp.broadcast_to(eye, self.batch_shape + (n_right, n_right))
        Wr_t = left_t_interp(self.right_interp_indices, self.right_interp_values, eye, m)  # (m, n_r)
        KWr_t = self.base.matmul(Wr_t)
        return left_interp(self.left_interp_indices, self.left_interp_values, KWr_t)

    def __getitem__(self, index):
        # row/col slicing slices the interpolation coefficients, never the base
        if isinstance(index, tuple) and len(index) >= 2 and all(isinstance(ix, slice) for ix in index[-2:]):
            row_ix, col_ix = index[-2], index[-1]
            batch_ix = index[:-2]
            li = self.left_interp_indices[batch_ix + (row_ix,)] if batch_ix else self.left_interp_indices[row_ix]
            lv = self.left_interp_values[batch_ix + (row_ix,)] if batch_ix else self.left_interp_values[row_ix]
            ri = self.right_interp_indices[batch_ix + (col_ix,)] if batch_ix else self.right_interp_indices[col_ix]
            rv = self.right_interp_values[batch_ix + (col_ix,)] if batch_ix else self.right_interp_values[col_ix]
            return InterpolatedLinearOperator(self.base, li, lv, ri, rv)
        return super().__getitem__(index)

    def evaluate_kernel(self):
        return InterpolatedLinearOperator(
            self.base.evaluate_kernel(),
            self.left_interp_indices,
            self.left_interp_values,
            self.right_interp_indices,
            self.right_interp_values,
        )
