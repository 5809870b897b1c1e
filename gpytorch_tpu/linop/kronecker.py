"""Kronecker-product operators (reference: linear_operator Kronecker*, used by multitask
kernels at gpytorch/kernels/multitask_kernel.py:54 and the multitask likelihood at
gpytorch/likelihoods/multitask_gaussian_likelihood.py:129-134)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .base import DenseLinearOperator, LinearOperator, to_linear_operator
from .diag import ConstantDiagLinearOperator, DiagLinearOperator


def _kron_matmul(factors, rhs):
    """(A₁ ⊗ ... ⊗ A_p) @ rhs via the reshaping trick — never materializes the product.

    rhs: (..., N, k) with N = ∏ nᵢ.  Cost: Σᵢ (N/nᵢ)·nᵢ·mᵢ·k flops (all MXU matmuls).
    """
    sizes_out = [f.shape[-2] for f in factors]
    sizes_in = [f.shape[-1] for f in factors]
    batch = rhs.shape[:-2]
    k = rhs.shape[-1]
    # x has logical shape (..., n_1, ..., n_p, k); contract factors one at a time.
    x = rhs.reshape(batch + tuple(sizes_in) + (k,))
    for i, f in enumerate(factors):
        axis = len(batch) + i
        x = jnp.moveaxis(x, axis, -2)
        pre_shape = x.shape[:-2]
        x2 = x.reshape((-1,) + x.shape[-2:])
        fd = f.to_dense() if isinstance(f, LinearOperator) else f
        if fd.ndim > 2:
            raise NotImplementedError("batched Kronecker factors use the dense fallback")
        y2 = jnp.einsum("mn,bnk->bmk", fd, x2)
        x = jnp.moveaxis(y2.reshape(pre_shape + y2.shape[-2:]), -2, axis)
    total_out = 1
    for s in sizes_out:
        total_out *= s
    return x.reshape(batch + (total_out, k))


class KroneckerProductLinearOperator(LinearOperator):
    def __init__(self, *factors):
        self.factors = tuple(to_linear_operator(f) for f in factors)

    def _shape(self):
        batch = jnp.broadcast_shapes(*[f.batch_shape for f in self.factors])
        n = 1
        m = 1
        for f in self.factors:
            n *= f.shape[-2]
            m *= f.shape[-1]
        return tuple(batch) + (n, m)

    def _has_batched_factors(self):
        return any(f.ndim > 2 for f in self.factors)

    def _matmul(self, rhs):
        if self._has_batched_factors():
            return self.to_dense() @ rhs
        return _kron_matmul(self.factors, rhs)

    def _t_matmul(self, rhs):
        if self._has_batched_factors():
            return jnp.swapaxes(self.to_dense(), -1, -2) @ rhs
        return _kron_matmul([f._transpose() for f in self.factors], rhs)

    def _transpose(self):
        return KroneckerProductLinearOperator(*[f._transpose() for f in self.factors])

    def _diagonal(self):
        out = self.factors[0]._diagonal()
        for f in self.factors[1:]:
            d = f._diagonal()
            out = (out[..., :, None] * d[..., None, :]).reshape(out.shape[:-1] + (out.shape[-1] * d.shape[-1],))
        return out

    def to_dense(self):
        out = self.factors[0].to_dense()
        for f in self.factors[1:]:
            d = f.to_dense()
            b = jnp.broadcast_shapes(out.shape[:-2], d.shape[:-2])
            n1, m1 = out.shape[-2:]
            n2, m2 = d.shape[-2:]
            prod = out[..., :, None, :, None] * d[..., None, :, None, :]
            out = prod.reshape(tuple(b) + (n1 * n2, m1 * m2))
        return out

    def cholesky(self, upper: bool = False):
        from .triangular import TriangularLinearOperator

        roots = [f.cholesky().to_dense() for f in self.factors]
        out = KroneckerProductLinearOperator(*roots).to_dense()
        return TriangularLinearOperator(jnp.swapaxes(out, -1, -2) if upper else out, upper=upper)

    def logdet(self):
        n = self.shape[-1]
        out = None
        for f in self.factors:
            term = f.logdet() * (n / f.shape[-1])
            out = term if out is None else out + term
        return out

    def solve(self, rhs, lhs=None):
        if self._has_batched_factors():
            return super().solve(rhs, lhs)
        rhs = jnp.asarray(rhs)
        squeeze = rhs.ndim == 1
        if squeeze:
            rhs = rhs[:, None]
        # (⊗ᵢ Aᵢ)⁻¹ = ⊗ᵢ Aᵢ⁻¹ — apply factor inverses via Cholesky solves
        from ..solvers.cholesky import psd_safe_cholesky

        inv_factors = []
        for f in self.factors:
            fd = f.to_dense()
            L = psd_safe_cholesky(fd)
            inv_factors.append(jax.scipy.linalg.cho_solve((L, True), jnp.eye(fd.shape[-1], dtype=fd.dtype)))
        res = _kron_matmul(inv_factors, rhs)
        if lhs is not None:
            res = lhs @ res
        return res[..., 0] if squeeze else res

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

    def root_decomposition(self, method: Optional[str] = None):
        from .root import RootLinearOperator

        roots = [f.root_decomposition().root.to_dense() for f in self.factors]
        return RootLinearOperator(KroneckerProductLinearOperator(*[DenseLinearOperator(r) for r in roots]).to_dense())

    def add_diagonal(self, diag):
        diag = jnp.asarray(diag, dtype=self.dtype)
        if diag.ndim == 0 or diag.shape[-1] == 1:
            return KroneckerProductAddedDiagLinearOperator(self, diag if diag.ndim > 0 else diag[None])
        return super().add_diagonal(diag)


class KroneckerProductDiagLinearOperator(KroneckerProductLinearOperator, DiagLinearOperator):
    """Kronecker product of diagonal operators — itself diagonal."""

    def __init__(self, *factors):
        self.factors = tuple(factors)

    @property
    def diag(self):
        return KroneckerProductLinearOperator._diagonal(self)

    def _diag_values(self):
        return self.diag

    def _shape(self):
        return KroneckerProductLinearOperator._shape(self)

    def _matmul(self, rhs):
        return self.diag[..., :, None] * rhs

    def _diagonal(self):
        return self.diag

    # use the diagonal closed forms, not the generic Kronecker ones
    solve = DiagLinearOperator.solve
    logdet = DiagLinearOperator.logdet
    inv_quad_logdet = DiagLinearOperator.inv_quad_logdet
    to_dense = DiagLinearOperator.to_dense
    cholesky = DiagLinearOperator.cholesky
    sqrt = DiagLinearOperator.sqrt
    inverse = DiagLinearOperator.inverse


class KroneckerProductAddedDiagLinearOperator(LinearOperator):
    """(⊗ᵢ Kᵢ) + σ²I solved in closed form via factor eigendecompositions.

    Reference: linear_operator KroneckerProductAddedDiagLinearOperator (multitask Gaussian
    likelihood hot path, gpytorch/likelihoods/multitask_gaussian_likelihood.py:129-134).
    With Kᵢ = Qᵢ Λᵢ Qᵢᵀ:  (K + σ²I)⁻¹ = (⊗Qᵢ)(Λ + σ²I)⁻¹(⊗Qᵢ)ᵀ.
    """

    def __init__(self, kron: KroneckerProductLinearOperator, const_diag):
        self.kron = kron
        self.const_diag = jnp.asarray(const_diag)  # (..., 1)

    def _shape(self):
        return self.kron.shape

    def _matmul(self, rhs):
        return self.kron._matmul(rhs) + self.const_diag[..., :, None] * rhs

    def _transpose(self):
        return KroneckerProductAddedDiagLinearOperator(self.kron._transpose(), self.const_diag)

    def _diagonal(self):
        return self.kron._diagonal() + self.const_diag

    def to_dense(self):
        n = self.shape[-1]
        return self.kron.to_dense() + self.const_diag[..., :, None] * jnp.eye(n, dtype=self.dtype)

    def _eigs(self):
        qs, lams = [], []
        for f in self.kron.factors:
            if isinstance(f, DiagLinearOperator):
                # trivial eigendecomposition for diagonal (incl. identity) factors
                lam = f._diag_values()
                q = jnp.eye(f.shape[-1], dtype=lam.dtype)
            else:
                lam, q = jnp.linalg.eigh(f.to_dense())
            qs.append(q)
            lams.append(lam)
        # full eigenvalues = kron of factor eigenvalues
        lam_full = lams[0]
        for lam in lams[1:]:
            lam_full = (lam_full[..., :, None] * lam[..., None, :]).reshape(
                lam_full.shape[:-1] + (lam_full.shape[-1] * lam.shape[-1],)
            )
        return qs, lam_full

    def solve(self, rhs, lhs=None):
        if self.kron._has_batched_factors():
            return LinearOperator.solve(self, rhs, lhs)
        rhs = jnp.asarray(rhs)
        squeeze = rhs.ndim == 1
        if squeeze:
            rhs = rhs[:, None]
        qs, lam = self._eigs()
        tmp = _kron_matmul([jnp.swapaxes(q, -1, -2) for q in qs], rhs)
        tmp = tmp / (lam + self.const_diag)[..., :, None]
        res = _kron_matmul(qs, tmp)
        if lhs is not None:
            res = lhs @ res
        return res[..., 0] if squeeze else res

    def logdet(self):
        _, lam = self._eigs()
        return jnp.sum(jnp.log(lam + self.const_diag), axis=-1)

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

    def add_diagonal(self, diag):
        diag = jnp.asarray(diag, dtype=self.dtype)
        if diag.ndim == 0:
            return KroneckerProductAddedDiagLinearOperator(self.kron, self.const_diag + diag)
        if diag.shape[-1] == 1:
            return KroneckerProductAddedDiagLinearOperator(self.kron, self.const_diag + diag)
        return LinearOperator.add_diagonal(self, diag)
