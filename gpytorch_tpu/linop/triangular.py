"""Triangular and Cholesky-factored operators (reference: linear_operator Triangular/Chol,
used at gpytorch/variational/variational_strategy.py:11)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from .base import DenseLinearOperator, LinearOperator


def _bcast_solve_triangular(a, b, lower):
    """jax.scipy's solve_triangular requires equal batch ranks — broadcast both sides
    (an unbatched K_ZZ factor against a batched rhs is routine in the batch-model SVGP
    matrix, reference variational_test_case.py:268-299)."""
    batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    a = jnp.broadcast_to(a, batch + a.shape[-2:])
    b = jnp.broadcast_to(b, batch + b.shape[-2:])
    return solve_triangular(a, b, lower=lower)


def _bcast_cho_solve(L, b):
    batch = jnp.broadcast_shapes(L.shape[:-2], b.shape[:-2])
    L = jnp.broadcast_to(L, batch + L.shape[-2:])
    b = jnp.broadcast_to(b, batch + b.shape[-2:])
    return jax.scipy.linalg.cho_solve((L, True), b)


class TriangularLinearOperator(LinearOperator):
    def __init__(self, tri, upper: bool = False):
        self.tri = tri.to_dense() if isinstance(tri, LinearOperator) else jnp.asarray(tri)
        self.upper = bool(upper)

    def _shape(self):
        return self.tri.shape

    def _matmul(self, rhs):
        return self.tri @ rhs

    def _t_matmul(self, rhs):
        return jnp.swapaxes(self.tri, -1, -2) @ rhs

    def _transpose(self):
        return TriangularLinearOperator(jnp.swapaxes(self.tri, -1, -2), upper=not self.upper)

    def _diagonal(self):
        return jnp.diagonal(self.tri, axis1=-2, axis2=-1)

    def to_dense(self):
        return self.tri

    def solve(self, rhs, lhs: Optional[jax.Array] = None):
        rhs = jnp.asarray(rhs)
        squeeze = rhs.ndim == 1
        if squeeze:
            rhs = rhs[:, None]
        res = _bcast_solve_triangular(self.tri, rhs, lower=not self.upper)
        if lhs is not None:
            res = lhs @ res
        return res[..., 0] if squeeze else res

    def inverse(self) -> "TriangularLinearOperator":
        n = self.tri.shape[-1]
        eye = jnp.broadcast_to(jnp.eye(n, dtype=self.tri.dtype), self.tri.shape)
        return TriangularLinearOperator(solve_triangular(self.tri, eye, lower=not self.upper), upper=self.upper)

    def logdet(self):
        return jnp.sum(jnp.log(jnp.abs(self._diagonal())), axis=-1)

    def inv_quad_logdet(self, inv_quad_rhs=None, logdet=False, reduce_inv_quad=True, key=None, config=None,
                        solver_state=None, return_state=False):
        if return_state:  # closed-form solve: warm-start state passes through untouched
            res = self.inv_quad_logdet(inv_quad_rhs, logdet, reduce_inv_quad, key, config)
            return res, solver_state
        ld = self.logdet() if logdet else None
        iq = None
        if inv_quad_rhs is not None:
            sol = self.solve(inv_quad_rhs)
            rhs = inv_quad_rhs if inv_quad_rhs.ndim > 1 else inv_quad_rhs[:, None]
            sol = sol if sol.ndim > 1 else sol[:, None]
            iq = jnp.sum(rhs * sol, axis=-2)
            if reduce_inv_quad:
                iq = jnp.sum(iq, axis=-1)
        return iq, ld


class CholLinearOperator(LinearOperator):
    """A = L Lᵀ given its Cholesky factor L (reference: linear_operator CholLinearOperator)."""

    def __init__(self, chol):
        if isinstance(chol, TriangularLinearOperator):
            if chol.upper:
                chol = chol._transpose()
            self.root = chol
        else:
            self.root = TriangularLinearOperator(jnp.asarray(chol), upper=False)

    @property
    def L(self):
        return self.root.tri

    def _shape(self):
        return self.root.tri.shape

    def _matmul(self, rhs):
        return self.L @ (jnp.swapaxes(self.L, -1, -2) @ rhs)

    def _transpose(self):
        return self

    def _diagonal(self):
        return jnp.sum(self.L * self.L, axis=-1)

    def to_dense(self):
        return self.L @ jnp.swapaxes(self.L, -1, -2)

    def cholesky(self, upper: bool = False):
        return self.root._transpose() if upper else self.root

    def solve(self, rhs, lhs=None):
        rhs = jnp.asarray(rhs)
        squeeze = rhs.ndim == 1
        if squeeze:
            rhs = rhs[:, None]
        res = _bcast_cho_solve(self.L, rhs)
        if lhs is not None:
            res = lhs @ res
        return res[..., 0] if squeeze else res

    def logdet(self):
        # |L Lᵀ| is invariant to column signs of L — abs handles unconstrained variational
        # Cholesky parameters whose diagonal may go negative during optimization.
        return 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(self.L, axis1=-2, axis2=-1)) + 1e-20), axis=-1)

    def inv_quad_logdet(self, inv_quad_rhs=None, logdet=False, reduce_inv_quad=True, key=None, config=None,
                        solver_state=None, return_state=False):
        if return_state:  # closed-form solve: warm-start state passes through untouched
            res = self.inv_quad_logdet(inv_quad_rhs, logdet, reduce_inv_quad, key, config)
            return res, solver_state
        ld = self.logdet() if logdet else None
        iq = None
        if inv_quad_rhs is not None:
            rhs = inv_quad_rhs if inv_quad_rhs.ndim > 1 else inv_quad_rhs[:, None]
            Linv_rhs = _bcast_solve_triangular(self.L, rhs, lower=True)
            iq = jnp.sum(Linv_rhs * Linv_rhs, axis=-2)
            if reduce_inv_quad:
                iq = jnp.sum(iq, axis=-1)
        return iq, ld

    def root_decomposition(self, method: Optional[str] = None):
        from .root import RootLinearOperator

        return RootLinearOperator(self.L)

    def root_inv_decomposition(self, initial_vectors=None, test_vectors=None, method=None):
        from .root import RootLinearOperator

        return RootLinearOperator(jnp.swapaxes(self.root.inverse().tri, -1, -2))

    def inverse(self) -> LinearOperator:
        Linv = self.root.inverse().tri
        return DenseLinearOperator(jnp.swapaxes(Linv, -1, -2) @ Linv)
