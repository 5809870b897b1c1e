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


# -- fast preconditioner-root gradient (settings.fast_precond_grad) ----------------------
# Primal = the pivoted-Cholesky scan factor, exactly as the legacy path computes it —
# pure-inference callers (eval CG, probe draws) pay ZERO extra cost because the Nyström
# factor only exists inside the VJP (ADVICE r3 #3: the old stop-gradient straddle kept
# L_nys in the primal where XLA could not DCE it).  Gradient = VJP through the fixed-pivot
# Nyström form K[:,p] K[p,p]⁻¹ K[p,:], the same function of the hypers as the scan on its
# pivot set (solvers/pivoted_cholesky.py::nystrom_factor_from_pivots), but one k×k
# Cholesky + one (k, n) triangular solve instead of a sequential reverse scan sweep.
def _pc_fast_grad_primal(base, rank, rel_tol):
    from ..solvers.pivoted_cholesky import pivoted_cholesky

    L, piv = pivoted_cholesky(base, rank=rank, rel_tol=rel_tol, return_pivots=True)
    return L, piv


def _pc_fast_grad_fwd(base, rank, rel_tol):
    L, piv = _pc_fast_grad_primal(base, rank, rel_tol)
    # truncation guard parity: columns the scan zeroed (exhausted residual) carry no
    # value and must carry no gradient either
    col_live = (jnp.sum(L * L, axis=-2, keepdims=True) > 0.0).astype(L.dtype)
    return (L, piv), (base, piv, col_live)


def _pc_fast_grad_bwd(rank, rel_tol, res, cotangents):
    from ..solvers.pivoted_cholesky import nystrom_factor_from_pivots

    base, piv, col_live = res
    g, _ = cotangents  # pivot cotangent is int/None — no gradient flows through pivots
    _, vjp = jax.vjp(lambda b: nystrom_factor_from_pivots(b, piv) * col_live, base)
    return vjp(g)


_pc_fast_grad = jax.custom_vjp(_pc_fast_grad_primal, nondiff_argnums=(1, 2))
_pc_fast_grad.defvjp(_pc_fast_grad_fwd, _pc_fast_grad_bwd)


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

    def _eig_lower_bound(self):
        # λ_min(K + D) ≥ λ_min(K) + min(D) by Weyl.  When the base declares no bound of
        # its own, min(D) alone is a valid floor ONLY for a PSD base (`_is_known_psd`) —
        # kernel matrices, R Rᵀ roots — never assumed for arbitrary symmetric operators.
        # This is what lets the Lanczos inverse root floor its Ritz values at σ² instead
        # of amplifying f32 Rayleigh–Ritz noise into 1/√(1e-8) spikes (see
        # LinearOperator._eig_lower_bound).
        diag_bound = self.diag_op._eig_lower_bound()
        if diag_bound is None:
            return None
        base_bound = self.base._eig_lower_bound()
        if base_bound is not None:
            return base_bound + diag_bound
        return diag_bound if self.base._is_known_psd() else None

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

        # settings.preconditioner_tolerance: stop adding pivot columns once the residual
        # trace is below this fraction of the original (linear_operator's preconditioner
        # early exit) — trailing columns come out exactly zero, which the Woodbury apply
        # below treats as inert
        if settings.fast_precond_grad.on():
            # Value from the scan (bit-identical to the legacy path — probe streams and
            # CG preconditioning see the exact same factor); gradient through the
            # fixed-pivot Nyström VJP, which only materializes when something actually
            # differentiates (see _pc_fast_grad above).
            L, _ = _pc_fast_grad(
                self.base, k, float(settings.preconditioner_tolerance.value())
            )  # (..., n, k)
        else:
            L = pivoted_cholesky(
                self.base, rank=k, rel_tol=float(settings.preconditioner_tolerance.value())
            )  # (..., n, k)
        diag = self.diag_op._diag_values()
        # τ-regularization (settings.preconditioner_noise_budget): bound cond(P) so the
        # finite-precision apply noise (~eps·cond(P), amplified λ_max-fold by K̂ inside CG)
        # stays below the requested budget.  P becomes LLᵀ + max(D, τ)I with
        # τ = λ_max(LLᵀ)·eps/budget — consistent everywhere (apply, log|P|, probe draws).
        budget = float(settings.preconditioner_noise_budget.value())
        if budget > 0.0:
            LtL = jnp.matmul(
                jnp.swapaxes(L, -1, -2), L, precision=jax.lax.Precision.HIGHEST
            )
            mu = jnp.linalg.eigvalsh(jax.lax.stop_gradient(LtL))[..., -1]  # λ_max(LLᵀ)
            tau = mu * (float(jnp.finfo(L.dtype).eps) / budget)
            diag = jnp.maximum(diag, tau[..., None])
        dinv = 1.0 / diag  # (..., n)
        # Whitened-eigenspace apply.  The textbook Woodbury
        #   P⁻¹v = D⁻¹v − D⁻¹L (I + Lᵀ D⁻¹ L)⁻¹ Lᵀ D⁻¹ v
        # is an f32 cancellation catastrophe at scale: cond(I + LᵀD⁻¹L) ≈ s_max²/σ² grows
        # with N·outputscale/noise (≈1e5 at the N=100k bench), so cho_solve loses ~2 digits
        # and the two O(1/σ²) terms cancel to garbage (measured on-chip: preconditioned CG
        # stalled at true residual 0.6-1.0).  Instead eigendecompose in the whitened space,
        #   Ũ = D^{-1/2}L = U S Wᵀ  ⇒  P⁻¹v = D^{-1/2}[w − U diag(s²/(1+s²)) Uᵀw],
        # where every coefficient is in [0,1) and no ill-conditioned k×k solve appears.
        # Precision of the n×k products follows settings.preconditioner_highest_precision,
        # and tight-tolerance solves (kernel_matvec_highest) force it (a one-pass-bf16
        # apply acts as a CHANGING preconditioner and stagnates CG above ~4e-3).
        _hp = (
            jax.lax.Precision.HIGHEST
            if settings.preconditioner_highest_precision.on() or settings.kernel_matvec_highest.on()
            or settings.kernel_matvec_high.on() or settings.kernel_matvec_consistent_bf16.on()
            else None
        )
        dsqrt_inv = jnp.sqrt(dinv)  # (..., n)
        Lt = L * dsqrt_inv[..., :, None]  # D^{-1/2} L
        # B = Ũᵀ Ũ is k×k — always HIGHEST, O(nk²) is negligible
        B = jnp.matmul(
            jnp.swapaxes(Lt, -1, -2), Lt, precision=jax.lax.Precision.HIGHEST
        )
        eye = jnp.eye(L.shape[-1], dtype=L.dtype)
        from ..solvers.cholesky import psd_safe_cholesky

        # log|P| = log|I + B| + log|D|  (Cholesky, differentiable — the VR logdet path
        # needs gradients, and eigh VJPs NaN on degenerate spectra)
        Lc = psd_safe_cholesky(eye + B, jitter=0.0, max_tries=1)
        logdet_p = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lc, axis1=-2, axis2=-1)), axis=-1) + jnp.sum(
            jnp.log(diag), axis=-1
        )

        # apply path is never differentiated (CG preconditioning / stop-gradiented probe
        # terms) — safe to eigh on a stop-gradient copy
        B_sg = jax.lax.stop_gradient(B)
        s2, W = jnp.linalg.eigh(B_sg)  # ascending
        s2 = jnp.maximum(s2, 0.0)
        s2_max = jnp.max(s2, axis=-1, keepdims=True)
        active = s2 > 1e-12 * jnp.maximum(s2_max, 1e-30)
        inv_s = jnp.where(active, 1.0 / jnp.sqrt(jnp.maximum(s2, 1e-30)), 0.0)
        U = jnp.matmul(jax.lax.stop_gradient(Lt), W * inv_s[..., None, :], precision=_hp)
        coef = jnp.where(active, s2 / (1.0 + s2), 0.0)  # (..., k), each in [0, 1)

        # Hoist the D^{-1/2} scaling into the eigenbasis factor once (Ũ = D^{-1/2}U):
        #   P⁻¹v = D^{-1/2}[w − U diag(c) Uᵀw], w = D^{-1/2}v  ≡  D⁻¹v − Ũ diag(c) Ũᵀv.
        # Identical arithmetic to rounding, but the per-apply elementwise traffic drops
        # from four (n, t) passes to one fused subtract — CG pays this every iteration.
        Ud = U * dsqrt_inv[..., :, None]

        def apply_inv(v):
            u = jnp.matmul(jnp.swapaxes(Ud, -1, -2), v, precision=_hp)
            return v * dinv[..., :, None] - jnp.matmul(Ud, coef[..., :, None] * u, precision=_hp)
        from .diag import DiagLinearOperator
        from .root import LowRankRootAddedDiagLinearOperator, RootLinearOperator

        diag_op = DiagLinearOperator(diag) if budget > 0.0 else self.diag_op
        precond_op = LowRankRootAddedDiagLinearOperator(RootLinearOperator(L), diag_op)
        return apply_inv, precond_op, logdet_p
