"""K + D — the operator that drives preconditioned CG (reference: linear_operator
AddedDiagLinearOperator, used at gpytorch/kernels/inducing_point_kernel.py:10 and every
Gaussian-likelihood marginal)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import settings
from .base import LinearOperator
from .diag import ConstantDiagLinearOperator, DiagLinearOperator


class AddedDiagLinearOperator(LinearOperator):
    def __init__(self, base: LinearOperator, diag_op: DiagLinearOperator):
        self.base = base
        self.diag_op = diag_op

    def _shape(self):
        return tuple(jnp.broadcast_shapes(self.base.shape, self.diag_op.shape))

    def _matmul(self, rhs):
        return self.base._matmul(rhs) + self.diag_op._matmul(rhs)

    def _t_matmul(self, rhs):
        return self.base._t_matmul(rhs) + self.diag_op._matmul(rhs)

    def _transpose(self):
        return AddedDiagLinearOperator(self.base._transpose(), self.diag_op)

    def _diagonal(self):
        return self.base._diagonal() + self.diag_op._diagonal()

    def to_dense(self):
        return self.base.to_dense() + self.diag_op.to_dense()

    def _get_rows(self, idx):
        base_rows = self.base._get_rows(idx)
        return base_rows + self.diag_op._get_rows(idx)

    def evaluate_kernel(self):
        base = self.base.evaluate_kernel()
        if base is self.base:
            return self
        return base.add_diagonal(self.diag_op._diag_values())

    def add_diagonal(self, diag):
        return AddedDiagLinearOperator(self.base, self.diag_op.add_diagonal(diag))

    def __add__(self, other):
        if isinstance(other, DiagLinearOperator):
            return AddedDiagLinearOperator(self.base, self.diag_op + other)
        return super().__add__(other)

    # -- preconditioning ---------------------------------------------------------------
    def _preconditioner(self):
        """Pivoted-Cholesky preconditioner P = L Lᵀ + D (reference: linear_operator
        added_diag_linear_operator preconditioner; gpytorch/__init__.py:146 pivoted_cholesky).

        Returns (apply_inv_fn, precond_root_op, logdet(P)).
        """
        k = settings.max_preconditioner_size.value()
        n = self.shape[-1]
        if k == 0 or n < settings.min_preconditioning_size.value():
            return None, None, None
        from ..solvers.pivoted_cholesky import pivoted_cholesky

        L = pivoted_cholesky(self.base, rank=k)  # (..., n, k)
        diag = self.diag_op._diag_values()
        dinv = 1.0 / diag  # (..., n)
        # Woodbury: P⁻¹ v = D⁻¹v − D⁻¹L (I + Lᵀ D⁻¹ L)⁻¹ Lᵀ D⁻¹ v.
        # Precision follows settings.preconditioner_highest_precision (see
        # solvers/pivoted_cholesky.py for why the default is one-pass bf16).
        _hp = (
            jax.lax.Precision.HIGHEST
            if settings.preconditioner_highest_precision.on()
            else None
        )
        dinv_L = L * dinv[..., :, None]
        eye = jnp.eye(L.shape[-1], dtype=L.dtype)
        cap = eye + jnp.matmul(jnp.swapaxes(L, -1, -2), dinv_L, precision=_hp)
        from ..solvers.cholesky import psd_safe_cholesky

        Lc = psd_safe_cholesky(cap)

        def apply_inv(v):
            dv = v * dinv[..., :, None]
            tmp = jnp.matmul(jnp.swapaxes(L, -1, -2), dv, precision=_hp)
            tmp = jax.scipy.linalg.cho_solve((Lc, True), tmp)
            return dv - jnp.matmul(dinv_L, tmp, precision=_hp)

        # log|P| = log|cap| + log|D|
        logdet_p = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lc, axis1=-2, axis2=-1)), axis=-1) + jnp.sum(
            jnp.log(diag), axis=-1
        )
        from .root import LowRankRootAddedDiagLinearOperator, RootLinearOperator

        precond_op = LowRankRootAddedDiagLinearOperator(RootLinearOperator(L), self.diag_op)
        return apply_inv, precond_op, logdet_p
