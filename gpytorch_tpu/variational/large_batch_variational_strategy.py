"""Large-batch variational strategy (reference:
gpytorch/variational/large_batch_variational_strategy.py:44).

Optimized for huge minibatches with a moderate number of inducing points:
  1. the middle term K_ZZ^{-1/2} (S − I) K_ZZ^{-T/2} is grouped once (m×m), saving a second
     large triangular solve against the n-sized cross-covariance;
  2. in training mode only the predictive *diagonal* is needed (the ELBO uses marginal
     variances), computed by a custom-VJP quadratic-form diagonal whose backward avoids
     the (m×n)·(n×m) matmul the naive autograd would do (reference QuadFormDiagonal :11).

TPU note: the reference needs fp64 to stabilize the grouped middle term on data-center
GPUs; here the triangular solves stay in the input dtype (f32 on TPU) and the jitter path
of psd_safe_cholesky guards conditioning — f64 would fall off the MXU entirely.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..linop.triangular import _bcast_solve_triangular


def _bcast_solve_triangular_upper(a, b):
    import jax.numpy as _jnp
    from jax.scipy.linalg import solve_triangular as _st
    batch = _jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    a = _jnp.broadcast_to(a, batch + a.shape[-2:])
    b = _jnp.broadcast_to(b, batch + b.shape[-2:])
    return _st(a, b, lower=False)

from ..distributions import MultivariateNormal
from ..linop import DenseLinearOperator, DiagLinearOperator, MatmulLinearOperator, SumLinearOperator
from ..solvers.cholesky import psd_safe_cholesky
from .variational_strategy import VariationalStrategy


@jax.custom_vjp
def quad_form_diagonal(matrix, rhs):
    """diag(rhsᵀ @ matrix @ rhs) for symmetric ``matrix`` (reference QuadFormDiagonal :11).

    Backward saves the large (m, n)·(n, m) product: d_matrix = rhs (d_diag ⊙ rhsᵀ),
    d_rhs = 2 (matrix @ rhs) ⊙ d_diag."""
    product = matrix @ rhs
    return jnp.sum(rhs * product, axis=-2)


def _qfd_fwd(matrix, rhs):
    product = matrix @ rhs
    return jnp.sum(rhs * product, axis=-2), (rhs, product)


def _qfd_bwd(res, d_diag):
    rhs, product = res
    d_matrix = rhs @ (d_diag[..., :, None] * jnp.swapaxes(rhs, -1, -2))
    d_rhs = 2.0 * product * d_diag[..., None, :]
    return d_matrix, d_rhs


quad_form_diagonal.defvjp(_qfd_fwd, _qfd_bwd)


class LargeBatchVariationalStrategy(VariationalStrategy):
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

        L = psd_safe_cholesky(induc_induc_covar.to_dense())

        # mean: k_xZ L⁻ᵀ m  — ONE small (m×m) solve, then an (n×m)·m matvec
        inv_chol_t_m = _bcast_solve_triangular_upper(jnp.swapaxes(L, -1, -2), inducing_values[..., None])
        pred_mean = (jnp.swapaxes(induc_data_covar, -1, -2) @ inv_chol_t_m)[..., 0] + test_mean

        # grouped middle term L⁻ᵀ (S − I) L⁻¹ (m×m), to be sandwiched by K_xZ ... K_Zx
        eye = jnp.eye(num_induc, dtype=L.dtype)
        middle = -eye if variational_inducing_covar is None else variational_inducing_covar.to_dense() - eye
        Lt = jnp.swapaxes(L, -1, -2)
        middle = _bcast_solve_triangular_upper(Lt, middle)  # L⁻ᵀ (S − I)
        middle = _bcast_solve_triangular_upper(Lt, jnp.swapaxes(middle, -1, -2))  # L⁻ᵀ (S − I) L⁻¹ (symmetric)

        if self.training:
            # ELBO only needs marginal variances — custom-VJP diagonal (reference :117-121)
            bshape = jnp.broadcast_shapes(middle.shape[:-2], induc_data_covar.shape[:-2])
            var_update = quad_form_diagonal(
                jnp.broadcast_to(middle, bshape + middle.shape[-2:]),
                jnp.broadcast_to(induc_data_covar, bshape + induc_data_covar.shape[-2:]),
            )
            diag = data_data_covar.evaluate_kernel()._diagonal() + var_update
            pred_covar = DiagLinearOperator(diag)
        else:
            pred_covar = SumLinearOperator(
                data_data_covar.evaluate_kernel(),
                MatmulLinearOperator(
                    DenseLinearOperator(jnp.swapaxes(induc_data_covar, -1, -2)),
                    DenseLinearOperator(middle @ induc_data_covar),
                ),
            )
        return MultivariateNormal(pred_mean, pred_covar)
