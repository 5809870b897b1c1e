"""InducingPointKernel — SGPR / Nyström (reference:
gpytorch/kernels/inducing_point_kernel.py:27): K ≈ (K_xZ L⁻ᵀ)(K_xZ L⁻ᵀ)ᵀ as a
LowRankRootLinearOperator (:75-90), so the Gaussian marginal becomes
LowRankRootAddedDiag with O(n·m²) Woodbury solves.  During training registers the
variance-correction added loss term (:107, sgpr_diagonal_correction)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from .. import settings
from ..distributions import MultivariateNormal
from ..linop import LowRankRootLinearOperator, RootLinearOperator
from ..mlls.added_loss_term import InducingPointKernelAddedLossTerm
from ..solvers.cholesky import psd_safe_cholesky
from .kernel import Kernel


class InducingPointKernel(Kernel):
    returns_lazy_structure = True
    def __init__(self, base_kernel: Kernel, inducing_points, likelihood, **kwargs):
        super().__init__(**kwargs)
        self.base_kernel = base_kernel
        self.likelihood = likelihood
        inducing_points = jnp.asarray(inducing_points)
        if inducing_points.ndim == 1:
            inducing_points = inducing_points[:, None]
        self.register_parameter("inducing_points", inducing_points)
        self.register_added_loss_term("inducing_point_loss_term")

    @property
    def _inducing_mat(self):
        with settings.lazily_evaluate_kernels(False):
            return self.base_kernel(self.inducing_points, self.inducing_points).to_dense()

    @property
    def _inducing_inv_root(self):
        """chol(K_ZZ)⁻ᵀ (reference _inducing_inv_root)."""
        L = psd_safe_cholesky(self._inducing_mat + 1e-4 * jnp.eye(self.inducing_points.shape[-2], dtype=self.inducing_points.dtype))
        eye = jnp.eye(L.shape[-1], dtype=L.dtype)
        Linv = solve_triangular(L, jnp.broadcast_to(eye, L.shape), lower=True)
        return jnp.swapaxes(Linv, -1, -2)

    def _get_covariance(self, x1, x2):
        with settings.lazily_evaluate_kernels(False):
            k_x1z = self.base_kernel(x1, self.inducing_points).to_dense()
        root1 = k_x1z @ self._inducing_inv_root
        if x1 is x2 or (x1.shape == x2.shape and jnp.shape(x1) == jnp.shape(x2) and x1 is x2):
            return LowRankRootLinearOperator(root1)
        with settings.lazily_evaluate_kernels(False):
            k_x2z = self.base_kernel(x2, self.inducing_points).to_dense()
        root2 = k_x2z @ self._inducing_inv_root
        from ..linop import MatmulLinearOperator

        return MatmulLinearOperator(root1, jnp.swapaxes(root2, -1, -2))

    def _covar_diag(self, inputs):
        if inputs.ndim == 1:
            inputs = inputs[:, None]
        with settings.lazily_evaluate_kernels(False):
            return self.base_kernel(inputs, inputs, diag=True)

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        covar = self._get_covariance(x1, x2)
        if self.training:
            if x1.shape != x2.shape:
                raise RuntimeError("x1 must equal x2 in training mode")
            # register the SGPR diagonal-correction loss term (reference :100-110)
            from ..linop import DiagLinearOperator

            zero_mean = jnp.zeros(x1.shape[:-1], dtype=x1.dtype)
            prior_dist = MultivariateNormal(zero_mean, DiagLinearOperator(self._covar_diag(x1)))
            var_dist = MultivariateNormal(zero_mean, DiagLinearOperator(covar._diagonal()))
            self.update_added_loss_term(
                "inducing_point_loss_term", InducingPointKernelAddedLossTerm(prior_dist, var_dist, self.likelihood)
            )
        if diag:
            return covar._diagonal()
        return covar

    def num_outputs_per_input(self, x1, x2):
        return self.base_kernel.num_outputs_per_input(x1, x2)

    def prediction_strategy(self, train_inputs, train_prior_dist, train_labels, likelihood):
        from ..models.exact_prediction_strategies import SGPRPredictionStrategy

        return SGPRPredictionStrategy(train_inputs, train_prior_dist, train_labels, likelihood)
