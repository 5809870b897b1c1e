"""CIQ variational strategy: whitening by contour-integral quadrature instead of Cholesky.

Reference: gpytorch/variational/ciq_variational_strategy.py:128 (Pleiss et al. 2020,
arXiv 2006.11267).  The whitened interpolation term K_ZZ^{-1/2} K_Zx is computed by
msMINRES/multi-shift-CG contour quadrature (solvers/contour.py) — every iteration is one
K_ZZ matvec, so large or structured inducing sets (M > 1000, grids) never get Cholesky'd.

The reference additionally has a hand-written autograd Function for the NGD fast path
(_NgdInterpTerms :20); here natural-parameter distributions run through the same whitened
math (JAX differentiates the shifted-CG loop), which is correct for all distributions.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .. import settings
from ..distributions import MultivariateNormal
from ..linop import IdentityLinearOperator, RootLinearOperator, SumLinearOperator
from ..solvers.contour import sqrt_inv_matmul
from ._variational_strategy import _VariationalStrategy


class CiqVariationalStrategy(_VariationalStrategy):
    def prior_distribution(self, model=None) -> MultivariateNormal:
        """Whitened prior = N(0, I) (reference :172-181)."""
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
        induc_induc_covar = full_covar[..., :num_induc, :num_induc].evaluate_kernel().add_jitter(self.jitter_val)
        induc_data_covar = full_covar[..., :num_induc, num_induc:].evaluate_kernel().to_dense()
        data_data_covar = full_covar[..., num_induc:, num_induc:]

        # interp = K_ZZ^{-1/2} K_Zx via contour-integral quadrature (no preconditioner,
        # matching the reference's settings.max_preconditioner_size(0) guard)
        with settings.max_preconditioner_size(0):
            interp_term = sqrt_inv_matmul(induc_induc_covar, induc_data_covar)  # (..., m, n)

        pred_mean = jnp.einsum("...mn,...m->...n", interp_term, inducing_values) + test_mean

        if variational_inducing_covar is not None:
            S_root = variational_inducing_covar.root_decomposition().root.to_dense()
            cov_root = jnp.swapaxes(interp_term, -1, -2) @ S_root
            pred_covar = SumLinearOperator(
                data_data_covar.evaluate_kernel(),
                RootLinearOperator(cov_root),
                RootLinearOperator(jnp.swapaxes(interp_term, -1, -2)) * -1.0,
            )
        else:
            pred_covar = SumLinearOperator(
                data_data_covar.evaluate_kernel(),
                RootLinearOperator(jnp.swapaxes(interp_term, -1, -2)) * -1.0,
            )
        return MultivariateNormal(pred_mean, pred_covar)
