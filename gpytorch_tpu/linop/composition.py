"""Composition operators: Sum, Matmul, ConstantMul, Cat, BatchRepeat, Masked
(reference: linear_operator composition classes used at
gpytorch/variational/variational_strategy.py:325-373, kernels/multi_device_kernel.py:90,
mlls/exact_marginal_log_likelihood.py:75)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .base import DenseLinearOperator, LinearOperator, to_linear_operator


class SumLinearOperator(LinearOperator):
    def __init__(self, *ops):
        flat = []
        for op in ops:
            if isinstance(op, SumLinearOperator):
                flat.extend(op.ops)
            else:
                flat.append(to_linear_operator(op))
        self.ops = tuple(flat)

    def _shape(self):
        return tuple(jnp.broadcast_shapes(*[op.shape for op in self.ops]))

    def _matmul(self, rhs):
        out = self.ops[0]._matmul(rhs)
        for op in self.ops[1:]:
            out = out + op._matmul(rhs)
        return out

    def _t_matmul(self, rhs):
        out = self.ops[0]._t_matmul(rhs)
        for op in self.ops[1:]:
            out = out + op._t_matmul(rhs)
        return out

    def _transpose(self):
        return SumLinearOperator(*[op._transpose() for op in self.ops])

    def _diagonal(self):
        out = self.ops[0]._diagonal()
        for op in self.ops[1:]:
            out = out + op._diagonal()
        return out

    def to_dense(self):
        out = self.ops[0].to_dense()
        for op in self.ops[1:]:
            out = out + op.to_dense()
        return out

    def _get_rows(self, idx):
        out = self.ops[0]._get_rows(idx)
        for op in self.ops[1:]:
            out = out + op._get_rows(idx)
        return out

    def evaluate_kernel(self):
        return SumLinearOperator(*[op.evaluate_kernel() for op in self.ops])


PsdSumLinearOperator = SumLinearOperator


class MatmulLinearOperator(LinearOperator):
    def __init__(self, left, right):
        self.left = to_linear_operator(left)
        self.right = to_linear_operator(right)

    def _shape(self):
        batch = jnp.broadcast_shapes(self.left.batch_shape, self.right.batch_shape)
        return tuple(batch) + (self.left.shape[-2], self.right.shape[-1])

    def _matmul(self, rhs):
        return self.left._matmul(self.right._matmul(rhs))

    def _t_matmul(self, rhs):
        return self.right._t_matmul(self.left._t_matmul(rhs))

    def _transpose(self):
        return MatmulLinearOperator(self.right._transpose(), self.left._transpose())

    def _diagonal(self):
        L = self.left.to_dense()
        R = self.right.to_dense()
        return jnp.einsum("...ij,...ji->...i", L, R)

    def to_dense(self):
        return self.left.to_dense() @ self.right.to_dense()


class ConstantMulLinearOperator(LinearOperator):
    def __init__(self, base: LinearOperator, constant):
        self.base = base
        self.constant = jnp.asarray(constant)

    def _expand_const(self, extra_dims: int):
        c = self.constant
        return c.reshape(c.shape + (1,) * extra_dims) if c.ndim > 0 else c

    def _shape(self):
        c_batch = self.constant.shape if self.constant.ndim > 0 else ()
        return tuple(jnp.broadcast_shapes(self.base.shape, c_batch + (1, 1)))

    def _matmul(self, rhs):
        return self._expand_const(2) * self.base._matmul(rhs)

    def _t_matmul(self, rhs):
        return self._expand_const(2) * self.base._t_matmul(rhs)

    def _transpose(self):
        return ConstantMulLinearOperator(self.base._transpose(), self.constant)

    def _diagonal(self):
        return self._expand_const(1) * self.base._diagonal()

    def to_dense(self):
        return self._expand_const(2) * self.base.to_dense()

    def _get_rows(self, idx):
        return self._expand_const(2) * self.base._get_rows(idx)

    def __mul__(self, other):
        if not isinstance(other, LinearOperator):
            other = jnp.asarray(other)
            if other.ndim == 0:
                return ConstantMulLinearOperator(self.base, self.constant * other)
        return super().__mul__(other)

    def evaluate_kernel(self):
        return ConstantMulLinearOperator(self.base.evaluate_kernel(), self.constant)


class CatLinearOperator(LinearOperator):
    """Concatenation of operators along rows or columns (reference: linear_operator
    CatLinearOperator, used by MultiDeviceKernel at gpytorch/kernels/multi_device_kernel.py:90)."""

    def __init__(self, ops: Sequence[LinearOperator], dim: int = -2):
        self.ops = tuple(to_linear_operator(op) for op in ops)
        if dim not in (-1, -2):
            raise ValueError("CatLinearOperator supports dim in {-1, -2}")
        self.dim = int(dim)

    def _shape(self):
        s0 = list(self.ops[0].shape)
        s0[self.dim] = sum(op.shape[self.dim] for op in self.ops)
        return tuple(s0)

    def _matmul(self, rhs):
        if self.dim == -2:
            return jnp.concatenate([op._matmul(rhs) for op in self.ops], axis=-2)
        # column-cat: split rhs
        outs = []
        offset = 0
        for op in self.ops:
            m = op.shape[-1]
            outs.append(op._matmul(jax.lax.slice_in_dim(rhs, offset, offset + m, axis=-2)))
            offset += m
        return sum(outs)

    def _transpose(self):
        return CatLinearOperator([op._transpose() for op in self.ops], dim=-1 if self.dim == -2 else -2)

    def to_dense(self):
        return jnp.concatenate([op.to_dense() for op in self.ops], axis=self.dim)


class BatchRepeatLinearOperator(LinearOperator):
    def __init__(self, base: LinearOperator, batch_repeat: Tuple[int, ...]):
        self.base = base
        self.batch_repeat = tuple(int(b) for b in batch_repeat)

    def _shape(self):
        batch = jnp.broadcast_shapes(self.base.batch_shape, self.batch_repeat)
        return tuple(batch) + self.base.matrix_shape

    def _matmul(self, rhs):
        out = self.base._matmul(rhs)
        return jnp.broadcast_to(out, self.batch_shape + out.shape[-2:])

    def _t_matmul(self, rhs):
        out = self.base._t_matmul(rhs)
        return jnp.broadcast_to(out, self.batch_shape + out.shape[-2:])

    def _transpose(self):
        return BatchRepeatLinearOperator(self.base._transpose(), self.batch_repeat)

    def _diagonal(self):
        d = self.base._diagonal()
        return jnp.broadcast_to(d, self.batch_shape + d.shape[-1:])

    def to_dense(self):
        return jnp.broadcast_to(self.base.to_dense(), self.shape)

    def evaluate_kernel(self):
        return BatchRepeatLinearOperator(self.base.evaluate_kernel(), self.batch_repeat)


class MaskedLinearOperator(LinearOperator):
    """Mask rows/cols of a square operator while keeping static shapes.

    The reference (linear_operator MaskedLinearOperator, used at
    gpytorch/mlls/exact_marginal_log_likelihood.py:75) *drops* masked rows — a dynamic shape.
    TPU-native version: K̃ = m mᵀ ⊙ K + diag(1−m), which satisfies
    log|K̃| = log|K[obs,obs]| and ỹᵀK̃⁻¹ỹ = y_obsᵀ K_obs⁻¹ y_obs for ỹ = m⊙y,
    so the masked MLL is exact without dynamic shapes.
    """

    def __init__(self, base: LinearOperator, mask):
        self.base = base
        self.mask = jnp.asarray(mask)

    def _shape(self):
        return self.base.shape

    def _masked(self, x):
        return jnp.where(self.mask, x, jnp.zeros_like(x))

    def _matmul(self, rhs):
        m = self.mask.astype(rhs.dtype)
        masked_rhs = rhs * m[..., :, None]
        out = self.base._matmul(masked_rhs) * m[..., :, None]
        return out + rhs * (1.0 - m)[..., :, None]

    def _transpose(self):
        return MaskedLinearOperator(self.base._transpose(), self.mask)

    def _diagonal(self):
        m = self.mask.astype(self.base.dtype)
        return self.base._diagonal() * m + (1.0 - m)

    def to_dense(self):
        m = self.mask.astype(self.base.dtype)
        K = self.base.to_dense() * (m[..., :, None] * m[..., None, :])
        n = self.shape[-1]
        return K + jnp.eye(n, dtype=K.dtype) * (1.0 - m)[..., None, :]

    def evaluate_kernel(self):
        return MaskedLinearOperator(self.base.evaluate_kernel(), self.mask)
