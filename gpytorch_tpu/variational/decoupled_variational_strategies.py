"""Decoupled variational strategies: separate inducing structure for mean and covariance.

Reference:
  * OrthogonallyDecoupledVariationalStrategy
    (gpytorch/variational/orthogonally_decoupled_variational_strategy.py:16; Salimbeni et al.
    2018, arXiv 1809.08820) — many cheap mean inducing points wrapping a base strategy that
    carries the (expensive) covariance inducing points.
  * BatchDecoupledVariationalStrategy
    (gpytorch/variational/batch_decoupled_variational_strategy.py:19; Jankowiak et al. 2020)
    — mean/covariance decoupling expressed as a size-2 batch dimension so both paths run as
    ONE batched (vmap-style) computation: ideal for the TPU, where the doubled batch rides
    the same MXU tiles.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..distributions import Delta, MultivariateNormal, kl_divergence
from ..linop import DenseLinearOperator, MatmulLinearOperator, RootLinearOperator, SumLinearOperator
from ..solvers.cholesky import psd_safe_cholesky
from ._variational_distribution import DeltaVariationalDistribution
from ._variational_strategy import _VariationalStrategy
from .variational_strategy import VariationalStrategy


class OrthogonallyDecoupledVariationalStrategy(_VariationalStrategy):
    """Delta q(u) over many mean inducing points; covariance handled by a wrapped base
    strategy (reference :16).  The wrapped strategy plays the "model" role."""

    def __init__(self, covar_variational_strategy, inducing_points, variational_distribution,
                 jitter_val: Optional[float] = None):
        if not isinstance(variational_distribution, DeltaVariationalDistribution):
            raise NotImplementedError(
                "OrthogonallyDecoupledVariationalStrategy currently works with DeltaVariationalDistribution"
            )
        super().__init__(
            covar_variational_strategy, inducing_points, variational_distribution,
            learn_inducing_locations=True, jitter_val=jitter_val,
        )
        self.base_variational_strategy = covar_variational_strategy

    def prior_distribution(self, model=None) -> MultivariateNormal:
        """q_base(u_mean) from the wrapped strategy plays the prior role (reference :79-84).

        ``model`` is the owning ApproximateGP (threaded through because functional copies
        drop back-references)."""
        out = self.base_variational_strategy(self.inducing_points, model=model)
        return MultivariateNormal(
            out.loc, out.lazy_covariance_matrix.evaluate_kernel().add_jitter(self.jitter_val)
        )

    def forward(self, x, inducing_points, inducing_values, variational_inducing_covar=None, model=None, **kwargs):
        if variational_inducing_covar is not None:
            raise NotImplementedError(
                "OrthogonallyDecoupledVariationalStrategy currently works with DeltaVariationalDistribution"
            )
        num_data = x.shape[-2]
        full_output = self.base_variational_strategy(
            jnp.concatenate([x, inducing_points], axis=-2), model=model, **kwargs
        )
        full_mean = full_output.loc
        full_covar = full_output.lazy_covariance_matrix

        test_mean = full_mean[..., :num_data]
        data_induc_covar = full_covar.to_dense()[..., :num_data, num_data:]
        predictive_mean = (data_induc_covar @ inducing_values[..., None])[..., 0] + test_mean
        predictive_covar = DenseLinearOperator(full_covar.to_dense()[..., :num_data, :num_data])
        return MultivariateNormal(predictive_mean, predictive_covar)

    def kl_divergence(self, model=None):
        """KL of the wrapped strategy + ½ mᵀ Σ_prior m for the decoupled mean (reference :129)."""
        mean = self.variational_distribution.mean
        induc_induc_covar = self.prior_distribution(model).lazy_covariance_matrix
        kl = self.base_variational_strategy.kl_divergence(model=model)
        return kl + 0.5 * jnp.sum((induc_induc_covar @ mean[..., None])[..., 0] * mean, axis=-1)


class BatchDecoupledVariationalStrategy(VariationalStrategy):
    """Mean/variance inducing points stacked on a batch dimension (reference :19).

    ``mean_var_batch_dim`` marks which (negative) batch dim separates mean vs variance
    kernel hyperparameters; None uses a dedicated extra dim."""

    def __init__(self, model, inducing_points, variational_distribution,
                 learn_inducing_locations: bool = True, mean_var_batch_dim: Optional[int] = None,
                 jitter_val: Optional[float] = None):
        if isinstance(variational_distribution, DeltaVariationalDistribution):
            raise NotImplementedError(
                "BatchDecoupledVariationalStrategy does not work with DeltaVariationalDistribution"
            )
        if mean_var_batch_dim is not None and mean_var_batch_dim >= 0:
            raise ValueError(f"mean_var_batch_dim should be negative indexed, got {mean_var_batch_dim}")
        inducing_points = jnp.asarray(inducing_points)
        if inducing_points.ndim == 1:
            inducing_points = inducing_points[:, None]
        stack_dim = (mean_var_batch_dim - 2) if mean_var_batch_dim is not None else -3
        inducing_points = jnp.stack([inducing_points, inducing_points], axis=stack_dim)
        super().__init__(model, inducing_points, variational_distribution,
                         learn_inducing_locations=learn_inducing_locations, jitter_val=jitter_val)
        self.mean_var_batch_dim = mean_var_batch_dim

    def __call__(self, x, prior: bool = False, model=None, **kwargs):
        # insert the mean/var batch dim into the inputs (reference _expand_inputs :173-179)
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[:, None]
        if not prior:
            insert = (self.mean_var_batch_dim - 2) if self.mean_var_batch_dim is not None else -3
            x = jnp.expand_dims(x, axis=insert)
        return super().__call__(x, prior=prior, model=model, **kwargs)

    def forward(self, x, inducing_points, inducing_values, variational_inducing_covar=None, model=None, **kwargs):
        model = self._resolve_model(model)
        mean_var_batch_dim = self.mean_var_batch_dim or -1
        num_induc = inducing_points.shape[-2]
        full_inputs = jnp.concatenate([inducing_points, x], axis=-2)
        full_output = model.forward(full_inputs)
        full_mean = full_output.loc
        full_covar = full_output.lazy_covariance_matrix

        test_mean = full_mean[..., num_induc:]
        induc_induc_covar = full_covar[..., :num_induc, :num_induc].evaluate_kernel().add_jitter(self.jitter_val)
        induc_data_covar = full_covar[..., :num_induc, num_induc:].evaluate_kernel().to_dense()
        data_data_covar = full_covar[..., num_induc:, num_induc:]

        L = psd_safe_cholesky(induc_induc_covar.to_dense())
        interp_term = solve_triangular(L, induc_data_covar, lower=True)  # (..., 2, m, n)

        sel_dim = mean_var_batch_dim - 2  # dim of the 2-stack within interp_term's batch
        mean_interp = jnp.take(interp_term, 0, axis=sel_dim)
        var_interp = jnp.take(interp_term, 1, axis=sel_dim)

        predictive_mean = (
            jnp.einsum("...mn,...m->...n", mean_interp, inducing_values)
            + jnp.take(test_mean, 0, axis=mean_var_batch_dim - 1)
        )

        # K_XX[var] + v_interpᵀ (S − I) v_interp
        middle = variational_inducing_covar.to_dense() - jnp.eye(num_induc, dtype=var_interp.dtype)
        data_covar_var = jnp.take(
            data_data_covar.evaluate_kernel().add_jitter(self.jitter_val).to_dense(), 1, axis=sel_dim
        )
        predictive_covar = SumLinearOperator(
            DenseLinearOperator(data_covar_var),
            MatmulLinearOperator(
                DenseLinearOperator(jnp.swapaxes(var_interp, -1, -2)),
                DenseLinearOperator(middle @ var_interp),
            ),
        )
        return MultivariateNormal(predictive_mean, predictive_covar)

    def kl_divergence(self, model=None):
        """KL[Delta(m) ‖ p(u)] + KL[N(0, S) ‖ p(u)] (reference :241-249); the Delta KL is
        the negative prior density of the mean, matching the reference's registered KL."""
        q = self.variational_distribution
        prior = self.prior_distribution(model)
        kl_mean = -prior.log_prob(q.mean)
        zero_mean_q = MultivariateNormal(jnp.zeros_like(q.mean), q.lazy_covariance_matrix)
        return kl_mean + kl_divergence(zero_mean_q, prior)
