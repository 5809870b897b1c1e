"""LeaveOneOutPseudoLikelihood (reference:
gpytorch/mlls/leave_one_out_pseudo_likelihood.py:14): closed-form LOO-CV objective from one
Cholesky factorization (Rasmussen & Williams §5.4.2):
  μᵢ = yᵢ − [K⁻¹(y−μ)]ᵢ / [K⁻¹]ᵢᵢ ,  σᵢ² = 1/[K⁻¹]ᵢᵢ."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..solvers.cholesky import psd_safe_cholesky
from .exact_marginal_log_likelihood import ExactMarginalLogLikelihood


class LeaveOneOutPseudoLikelihood(ExactMarginalLogLikelihood):
    def forward(self, function_dist, target, *params, **kwargs):
        output = self.likelihood(function_dist, *params, **kwargs)
        m, L = output.loc, psd_safe_cholesky(output.lazy_covariance_matrix.evaluate_kernel().to_dense())
        n = target.shape[-1]
        eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
        identity = eye
        sigma2 = 1.0 / jnp.sum(
            jax.scipy.linalg.solve_triangular(L, identity, lower=True) ** 2, axis=-2
        )  # 1/diag(K⁻¹)
        diff = (target - m)[..., None]
        solve = jax.scipy.linalg.cho_solve((L, True), diff)[..., 0]
        mu = target - solve * sigma2
        term = -0.5 * (jnp.log(2 * math.pi * sigma2) + (target - mu) ** 2 / sigma2)
        res = jnp.sum(term, axis=-1)
        res = self._add_other_terms(res, params)
        return res / n
