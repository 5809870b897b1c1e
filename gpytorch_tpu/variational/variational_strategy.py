"""Whitened variational strategy (reference: gpytorch/variational/variational_strategy.py:142).

q(u) is over whitened inducing values u' = L⁻¹(u − μ_Z) with L = chol(K_ZZ), so the prior is
N(0, I) and the predictive is
  μ_f(x) = μ(x) + K_xZ L⁻ᵀ m
  Σ_f(x) = K_xx + K_xZ L⁻ᵀ (S − I) L⁻¹ K_Zx
(reference forward :329-378).  One fused kernel forward over cat([Z, x]) provides all blocks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..linop.triangular import _bcast_cho_solve, _bcast_solve_triangular

from .. import settings
from ..distributions import MultivariateNormal
from ..linop import (
    DenseLinearOperator,
    DiagLinearOperator,
    IdentityLinearOperator,
    LinearOperator,
    RootLinearOperator,
    SumLinearOperator,
)
from ..solvers.cholesky import psd_safe_cholesky
from ._variational_strategy import _VariationalStrategy


def _pseudo_points_from(var_chol, var_mean, cov_diff, K_root, jitter_val, whitened: bool):
    """Shared OVC pseudo-point math (reference variational_strategy.py:209-262 /
    unwhitened_variational_strategy.py:71-120).

    D̃ = (S⁻¹ − R⁻¹_prior)⁻¹ = S + S R⁻¹ S with R = I − S (whitened) or K − S (unwhitened);
    computed via the normal equations (R Rᵀ + εI)⁻¹ Rᵀ S since R need not be PSD.
    Whitened quantities are mapped back through K^{1/2}.
    """
    S = var_chol @ jnp.swapaxes(var_chol, -1, -2)
    m_vec = var_mean[..., None]
    Rt_S = jnp.swapaxes(cov_diff, -1, -2) @ S
    inner = cov_diff @ jnp.swapaxes(cov_diff, -1, -2) + jitter_val * jnp.eye(
        cov_diff.shape[-1], dtype=cov_diff.dtype
    )
    Linner = psd_safe_cholesky(inner)
    inner_solve = _bcast_cho_solve(Linner, Rt_S)
    pseudo_covar = S + S @ inner_solve
    rhs = jnp.swapaxes(cov_diff, -1, -2) @ m_vec
    inner_mean_solve = _bcast_cho_solve(Linner, rhs)
    if whitened:
        pseudo_covar = K_root @ pseudo_covar @ jnp.swapaxes(K_root, -1, -2)
        pseudo_mean = K_root @ inner_mean_solve
    else:
        pseudo_mean = m_vec + S @ inner_mean_solve
    # symmetrize (solve round-off)
    pseudo_covar = 0.5 * (pseudo_covar + jnp.swapaxes(pseudo_covar, -1, -2))
    return pseudo_covar, pseudo_mean


class VariationalStrategy(_VariationalStrategy):
    def pseudo_points(self, model=None):
        """Whitened OVC pseudo points (reference variational_strategy.py:209-262)."""
        from ._variational_distribution import CholeskyVariationalDistribution

        if not isinstance(self._variational_distribution, CholeskyVariationalDistribution):
            raise NotImplementedError("pseudo points require CholeskyVariationalDistribution")
        model = self._resolve_model(model)
        var_chol = jnp.tril(self._variational_distribution.chol_variational_covar)
        var_mean = self._variational_distribution.variational_mean
        S = var_chol @ jnp.swapaxes(var_chol, -1, -2)
        eye = jnp.eye(S.shape[-1], dtype=S.dtype)
        K_ZZ = model.forward(self.inducing_points).lazy_covariance_matrix.evaluate_kernel()
        K_root = psd_safe_cholesky(K_ZZ.add_jitter(self.jitter_val).to_dense())
        return _pseudo_points_from(var_chol, var_mean, eye - S, K_root, self.jitter_val, whitened=True)

    def prior_distribution(self, model=None) -> MultivariateNormal:
        """Whitened prior = N(0, I) (reference: variational_strategy.py prior_distribution)."""
        m = self._variational_distribution.num_inducing_points
        batch = tuple(self._variational_distribution.batch_shape)
        dtype = self.inducing_points.dtype
        zeros = jnp.zeros(batch + (m,), dtype=dtype)
        return MultivariateNormal(zeros, IdentityLinearOperator(m, dtype=dtype, batch_shape=batch))

    def forward(self, x, inducing_points, inducing_values, variational_inducing_covar=None, model=None, **kwargs):
        model = self._resolve_model(model)
        num_induc = inducing_points.shape[-2]
        full_inputs = jnp.concatenate([inducing_points, x], axis=-2)
        full_output = model.forward(full_inputs)
        full_mean = full_output.loc
        full_covar = full_output.lazy_covariance_matrix

        test_mean = full_mean[..., num_induc:]
        induc_mean = full_mean[..., :num_induc]

        induc_induc_covar = full_covar[..., :num_induc, :num_induc].evaluate_kernel().add_jitter(self.jitter_val)
        induc_data_covar = full_covar[..., :num_induc, num_induc:].evaluate_kernel().to_dense()
        data_data_covar = full_covar[..., num_induc:, num_induc:]

        # L = chol(K_ZZ); interp = L⁻¹ K_Zx (reference _cholesky_factor :191 + interp terms)
        L = psd_safe_cholesky(induc_induc_covar.to_dense())
        interp_term = solve_triangular(L, induc_data_covar, lower=True)  # (..., m, n)

        # predictive mean (whitened): μ(x) + interpᵀ m
        pred_mean = jnp.einsum("...mn,...m->...n", interp_term, inducing_values) + test_mean

        # predictive covariance: K_xx + interpᵀ (S − I) interp
        if variational_inducing_covar is not None:
            S_root = variational_inducing_covar.root_decomposition().root.to_dense()  # (..., m, k)
            cov_root = jnp.swapaxes(interp_term, -1, -2) @ S_root  # (..., n, k)
            middle_plus = RootLinearOperator(cov_root)
            neg_part = RootLinearOperator(jnp.swapaxes(interp_term, -1, -2))  # interpᵀ interp
            pred_covar = SumLinearOperator(
                data_data_covar.evaluate_kernel(),
                middle_plus,
                neg_part * -1.0,
            )
        else:
            # Delta q(u): Σ_f = K_xx − interpᵀ interp
            neg_part = RootLinearOperator(jnp.swapaxes(interp_term, -1, -2))
            pred_covar = SumLinearOperator(data_data_covar.evaluate_kernel(), neg_part * -1.0)

        return MultivariateNormal(pred_mean, pred_covar)


class UnwhitenedVariationalStrategy(_VariationalStrategy):
    """q(u) directly over inducing values (reference:
    gpytorch/variational/unwhitened_variational_strategy.py:29)."""

    def pseudo_points(self, model=None):
        """Unwhitened OVC pseudo points, R = K − S (reference :71-120)."""
        from ._variational_distribution import CholeskyVariationalDistribution

        if not isinstance(self._variational_distribution, CholeskyVariationalDistribution):
            raise NotImplementedError("pseudo points require CholeskyVariationalDistribution")
        model = self._resolve_model(model)
        var_chol = jnp.tril(self._variational_distribution.chol_variational_covar)
        var_mean = self._variational_distribution.variational_mean
        S = var_chol @ jnp.swapaxes(var_chol, -1, -2)
        K_ZZ = model.forward(self.inducing_points).lazy_covariance_matrix.evaluate_kernel().to_dense()
        return _pseudo_points_from(var_chol, var_mean, K_ZZ - S, None, self.jitter_val, whitened=False)

    def prior_distribution(self, model=None) -> MultivariateNormal:
        model = self._resolve_model(model)
        out = model.forward(self.inducing_points)
        return MultivariateNormal(out.loc, out.lazy_covariance_matrix.evaluate_kernel().add_jitter(self.jitter_val))

    def forward(self, x, inducing_points, inducing_values, variational_inducing_covar=None, model=None, **kwargs):
        model = self._resolve_model(model)
        num_induc = inducing_points.shape[-2]
        full_inputs = jnp.concatenate([inducing_points, x], axis=-2)
        full_output = model.forward(full_inputs)
        full_mean = full_output.loc
        full_covar = full_output.lazy_covariance_matrix

        test_mean = full_mean[..., num_induc:]
        induc_mean = full_mean[..., :num_induc]

        K_ZZ = full_covar[..., :num_induc, :num_induc].evaluate_kernel().add_jitter(self.jitter_val)
        K_Zx = full_covar[..., :num_induc, num_induc:].evaluate_kernel().to_dense()
        K_xx = full_covar[..., num_induc:, num_induc:]

        L = psd_safe_cholesky(K_ZZ.to_dense())
        # A = K_ZZ⁻¹ K_Zx via two triangular solves
        tmp = _bcast_solve_triangular(L, K_Zx, lower=True)
        Lt = jnp.broadcast_to(jnp.swapaxes(L, -1, -2), tmp.shape[:-2] + L.shape[-2:])
        A = solve_triangular(Lt, tmp, lower=False)  # (..., m, n)

        pred_mean = test_mean + jnp.einsum("...mn,...m->...n", A, inducing_values - induc_mean)

        # Σ_f = K_xx − K_xZ K_ZZ⁻¹ K_Zx + Aᵀ S A
        neg_part = RootLinearOperator(jnp.swapaxes(tmp, -1, -2))  # K_xZ K_ZZ⁻¹ K_Zx
        parts = [K_xx.evaluate_kernel(), neg_part * -1.0]
        if variational_inducing_covar is not None:
            S_root = variational_inducing_covar.root_decomposition().root.to_dense()
            parts.append(RootLinearOperator(jnp.swapaxes(A, -1, -2) @ S_root))
        return MultivariateNormal(pred_mean, SumLinearOperator(*parts))
