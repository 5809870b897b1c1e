"""Block-structured operators (reference: linear_operator BlockDiag/BlockInterleaved, used by
DeepGP layers at gpytorch/models/deep_gps/deep_gp.py:105 and MultitaskMultivariateNormal at
gpytorch/distributions/multitask_multivariate_normal.py:122)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .base import LinearOperator, to_linear_operator


class BlockDiagLinearOperator(LinearOperator):
    """Interprets the last batch dim of ``base`` as diagonal blocks:
    base (..., B, n, n) → operator (..., B·n, B·n) with block-diagonal structure."""

    def __init__(self, base: LinearOperator):
        self.base = to_linear_operator(base)
        if self.base.ndim < 3:
            raise ValueError("BlockDiagLinearOperator requires a batched base operator")

    @property
    def num_blocks(self) -> int:
        return self.base.shape[-3]

    def _shape(self):
        s = self.base.shape
        return s[:-3] + (s[-3] * s[-2], s[-3] * s[-1])

    def _blockify(self, rhs):
        B = self.num_blocks
        n = self.base.shape[-1]
        k = rhs.shape[-1]
        return rhs.reshape(rhs.shape[:-2] + (B, n, k))

    def _unblockify(self, x):
        B = self.num_blocks
        m = self.base.shape[-2]
        return x.reshape(x.shape[:-3] + (B * m, x.shape[-1]))

    def _matmul(self, rhs):
        return self._unblockify(self.base._matmul(self._blockify(rhs)))

    def _t_matmul(self, rhs):
        return self._unblockify(self.base._t_matmul(self._blockify(rhs)))

    def _transpose(self):
        return BlockDiagLinearOperator(self.base._transpose())

    def _diagonal(self):
        d = self.base._diagonal()  # (..., B, n)
        return d.reshape(d.shape[:-2] + (d.shape[-2] * d.shape[-1],))

    def to_dense(self):
        # dense[b·n+i, c·m+j] = δ_{bc} · Kb[b, i, j]
        Kb = self.base.to_dense()  # (..., B, n, m)
        B, n, m = Kb.shape[-3:]
        eye = jnp.eye(B, dtype=Kb.dtype)
        big = jnp.einsum("...bcij->...bicj", Kb[..., :, None, :, :] * eye[:, :, None, None])
        return big.reshape(Kb.shape[:-3] + (B * n, B * m))

    def solve(self, rhs, lhs=None):
        rhs = jnp.asarray(rhs)
        squeeze = rhs.ndim == 1
        if squeeze:
            rhs = rhs[:, None]
        res = self._unblockify(self.base.solve(self._blockify(rhs)))
        if lhs is not None:
            res = lhs @ res
        return res[..., 0] if squeeze else res

    def inv_quad_logdet(self, inv_quad_rhs=None, logdet=False, reduce_inv_quad=True, key=None, config=None,
                        solver_state=None, return_state=False):
        if return_state:  # closed-form solve: warm-start state passes through untouched
            res = self.inv_quad_logdet(inv_quad_rhs, logdet, reduce_inv_quad, key, config)
            return res, solver_state
        rhs_b = None
        if inv_quad_rhs is not None:
            rhs = inv_quad_rhs if inv_quad_rhs.ndim > 1 else inv_quad_rhs[:, None]
            rhs_b = self._blockify(rhs)
        iq_b, ld_b = self.base.inv_quad_logdet(rhs_b, logdet=logdet, reduce_inv_quad=reduce_inv_quad, key=key, config=config)
        ld = jnp.sum(ld_b, axis=-1) if ld_b is not None else None
        iq = jnp.sum(iq_b, axis=-1) if iq_b is not None else None
        return iq, ld

    def logdet(self):
        return jnp.sum(self.base.logdet(), axis=-1)

    def cholesky(self, upper: bool = False):
        return BlockDiagLinearOperator(self.base.cholesky(upper=upper))

    def root_decomposition(self, method: Optional[str] = None):
        from .root import RootLinearOperator

        return RootLinearOperator(BlockDiagLinearOperator(self.base.root_decomposition().root))

    def add_diagonal(self, diag):
        diag = jnp.asarray(diag, dtype=self.dtype)
        B = self.num_blocks
        n = self.base.shape[-1]
        if diag.ndim == 0:
            return BlockDiagLinearOperator(self.base.add_diagonal(diag))
        if diag.shape[-1] == 1:
            return BlockDiagLinearOperator(self.base.add_diagonal(diag[..., None, :]))
        if diag.shape[-1] == B * n:
            return BlockDiagLinearOperator(self.base.add_diagonal(diag.reshape(diag.shape[:-1] + (B, n))))
        return super().add_diagonal(diag)

    def zero_mean_mvn_samples(self, key, num_samples):
        s = self.base.zero_mean_mvn_samples(key, num_samples)  # (S, ..., B, n)
        return s.reshape(s.shape[:-2] + (s.shape[-2] * s.shape[-1],))


class BlockInterleavedLinearOperator(BlockDiagLinearOperator):
    """Like BlockDiag but with interleaved ordering: entry (i·B+b) ↔ block b, index i.

    Used for MultitaskMultivariateNormal's default interleaved task layout
    (reference: gpytorch/distributions/multitask_multivariate_normal.py:122).
    """

    def _blockify(self, rhs):
        B = self.num_blocks
        n = self.base.shape[-1]
        k = rhs.shape[-1]
        x = rhs.reshape(rhs.shape[:-2] + (n, B, k))
        return jnp.swapaxes(x, -3, -2)  # (..., B, n, k)

    def _unblockify(self, x):
        B = self.num_blocks
        m = self.base.shape[-2]
        y = jnp.swapaxes(x, -3, -2)  # (..., m, B, k)
        return y.reshape(y.shape[:-3] + (m * B, x.shape[-1]))

    def _diagonal(self):
        d = self.base._diagonal()  # (..., B, n)
        d = jnp.swapaxes(d, -1, -2)  # (..., n, B)
        return d.reshape(d.shape[:-2] + (d.shape[-2] * d.shape[-1],))

    def to_dense(self):
        # dense[i·B+b, j·B+c] = δ_{bc} · Kb[b, i, j]
        Kb = self.base.to_dense()
        B, n, m = Kb.shape[-3:]
        eye = jnp.eye(B, dtype=Kb.dtype)
        big = jnp.einsum("...bcij->...ibjc", Kb[..., :, None, :, :] * eye[:, :, None, None])
        return big.reshape(Kb.shape[:-3] + (n * B, m * B))

    def zero_mean_mvn_samples(self, key, num_samples):
        s = self.base.zero_mean_mvn_samples(key, num_samples)  # (S, ..., B, n)
        s = jnp.swapaxes(s, -1, -2)
        return s.reshape(s.shape[:-2] + (s.shape[-2] * s.shape[-1],))

    def add_diagonal(self, diag):
        diag = jnp.asarray(diag, dtype=self.dtype)
        B = self.num_blocks
        n = self.base.shape[-1]
        if diag.ndim == 0:
            return BlockInterleavedLinearOperator(self.base.add_diagonal(diag))
        if diag.shape[-1] == 1:
            return BlockInterleavedLinearOperator(self.base.add_diagonal(diag[..., None, :]))
        if diag.shape[-1] == B * n:
            d = diag.reshape(diag.shape[:-1] + (n, B))
            return BlockInterleavedLinearOperator(self.base.add_diagonal(jnp.swapaxes(d, -1, -2)))
        return LinearOperator.add_diagonal(self, diag)
