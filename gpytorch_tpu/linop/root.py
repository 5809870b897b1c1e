"""Root / low-rank operators (reference: linear_operator Root/LowRankRoot[AddedDiag], used by
SGPR at gpytorch/kernels/inducing_point_kernel.py:75-90 and LOVE caches)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .base import DenseLinearOperator, LinearOperator, probe_base_samples, to_dense
from .diag import ConstantDiagLinearOperator, DiagLinearOperator


class RootLinearOperator(LinearOperator):
    """A = R Rᵀ for a (possibly rectangular) root R."""

    def _is_known_psd(self) -> bool:
        return True  # R Rᵀ is PSD by construction

    def __init__(self, root):
        if isinstance(root, LinearOperator):
            self.root = root
        else:
            self.root = DenseLinearOperator(jnp.asarray(root))

    def _shape(self):
        s = self.root.shape
        return s[:-1] + (s[-2],)

    def _matmul(self, rhs):
        return self.root.matmul(self.root._t_matmul(rhs))

    def _transpose(self):
        return self

    def _diagonal(self):
        R = self.root.to_dense()
        return jnp.sum(R * R, axis=-1)

    def to_dense(self):
        R = self.root.to_dense()
        return R @ jnp.swapaxes(R, -1, -2)

    def root_decomposition(self, method: Optional[str] = None):
        return self

    def add_low_rank(self, new_root) -> "RootLinearOperator":
        R = self.root.to_dense()
        return RootLinearOperator(jnp.concatenate([R, to_dense(new_root)], axis=-1))

    def zero_mean_mvn_samples(self, key, num_samples):
        R = self.root.to_dense()
        k = R.shape[-1]
        base = probe_base_samples(key, (num_samples,) + self.batch_shape + (k, 1), R.dtype)
        return (R @ base)[..., 0]


class LowRankRootLinearOperator(RootLinearOperator):
    """Same algebra as RootLinearOperator; tagged low-rank (rank k << n)."""


class LowRankRootAddedDiagLinearOperator(LinearOperator):
    """R Rᵀ + D — solved in closed form by Woodbury / matrix determinant lemma.

    Reference use: SGPR (gpytorch/kernels/inducing_point_kernel.py:75-90 with
    sgpr_diagonal_correction) and RFF prediction strategies.
    """

    def __init__(self, low_rank: RootLinearOperator, diag: DiagLinearOperator):
        self.low_rank = low_rank if isinstance(low_rank, RootLinearOperator) else RootLinearOperator(low_rank)
        if not isinstance(diag, (DiagLinearOperator, ConstantDiagLinearOperator)):
            diag = DiagLinearOperator(jnp.asarray(diag))
        self.diag_op = diag

    @property
    def _root(self):
        return self.low_rank.root.to_dense()

    def _shape(self):
        return jnp.broadcast_shapes(self.low_rank.shape, self.diag_op.shape)

    def _matmul(self, rhs):
        return self.low_rank._matmul(rhs) + self.diag_op._matmul(rhs)

    def _transpose(self):
        return self

    def _diagonal(self):
        return self.low_rank._diagonal() + self.diag_op._diagonal()

    def to_dense(self):
        return self.low_rank.to_dense() + self.diag_op.to_dense()

    def _cap_mat(self):
        """I_k + Rᵀ D⁻¹ R (the Woodbury capacitance matrix)."""
        R = self._root
        dinv_R = self.diag_op.solve(R)
        k = R.shape[-1]
        eye = jnp.eye(k, dtype=R.dtype)
        return eye + jnp.swapaxes(R, -1, -2) @ dinv_R, dinv_R

    def solve(self, rhs, lhs=None):
        rhs = jnp.asarray(rhs)
        squeeze = rhs.ndim == 1
        if squeeze:
            rhs = rhs[:, None]
        cap, dinv_R = self._cap_mat()
        from ..solvers.cholesky import psd_safe_cholesky

        Lc = psd_safe_cholesky(cap)
        dinv_rhs = self.diag_op.solve(rhs)
        tmp = jnp.swapaxes(self._root, -1, -2) @ dinv_rhs
        tmp = jax.scipy.linalg.cho_solve((Lc, True), tmp)
        res = dinv_rhs - dinv_R @ tmp
        if lhs is not None:
            res = lhs @ res
        return res[..., 0] if squeeze else res

    def logdet(self):
        cap, _ = self._cap_mat()
        from ..solvers.cholesky import psd_safe_cholesky

        Lc = psd_safe_cholesky(cap)
        cap_logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lc, axis1=-2, axis2=-1)), axis=-1)
        return cap_logdet + self.diag_op.logdet()

    def inv_quad_logdet(self, inv_quad_rhs=None, logdet=False, reduce_inv_quad=True, key=None, config=None,
                        solver_state=None, return_state=False):
        if return_state:  # closed-form solve: warm-start state passes through untouched
            res = self.inv_quad_logdet(inv_quad_rhs, logdet, reduce_inv_quad, key, config)
            return res, solver_state
        ld = self.logdet() if logdet else None
        iq = None
        if inv_quad_rhs is not None:
            rhs = inv_quad_rhs if inv_quad_rhs.ndim > 1 else inv_quad_rhs[:, None]
            sol = self.solve(rhs)
            iq = jnp.sum(rhs * sol, axis=-2)
            if reduce_inv_quad:
                iq = jnp.sum(iq, axis=-1)
        return iq, ld

    def zero_mean_mvn_samples(self, key, num_samples):
        """Exact sampling: x = R u₁ + D^{1/2} u₂ with u ~ N(0, I)."""
        R = self._root
        k1, k2 = jax.random.split(key)
        k = R.shape[-1]
        u1 = probe_base_samples(k1, (num_samples,) + self.batch_shape + (k, 1), R.dtype)
        u2 = probe_base_samples(k2, (num_samples,) + self.batch_shape + (self.shape[-1],), R.dtype)
        return (R @ u1)[..., 0] + jnp.sqrt(self.diag_op._diag_values()) * u2

    def __add__(self, other):
        if isinstance(other, DiagLinearOperator):
            return LowRankRootAddedDiagLinearOperator(self.low_rank, self.diag_op + other)
        return super().__add__(other)

    def add_diagonal(self, diag):
        return LowRankRootAddedDiagLinearOperator(self.low_rank, self.diag_op.add_diagonal(diag))
