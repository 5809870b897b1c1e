"""Grid-interpolation (SKI) variational strategies.

Reference: gpytorch/variational/grid_interpolation_variational_strategy.py:17 and
additive_grid_interpolation_variational_strategy.py:15 (Wilson et al. 2016, arXiv 1611.00336):
inducing points are fixed to a grid and f(x) = W(x) u is a *deterministic* cubic-interpolation
of the inducing values, so q(f) = N(W m, W S Wᵀ) with no kernel solves at data points.

TPU notes: the interpolation weights are a static 4^d-sparse gather (ops/interp.py) — the
predictive covariance stays an InterpolatedLinearOperator, never densified.  For the additive
variant the per-dimension sum Σ_d W_d S_d W_dᵀ is expressed as ONE interpolated operator over
a block-diagonal base with index offsets — keeping the additive structure lazy.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..distributions import Delta, MultivariateNormal
from ..linop import BlockDiagLinearOperator, InterpolatedLinearOperator
from ..ops.interp import left_interp
from ..utils.grid import create_data_from_grid, create_grid
from ..utils.interpolation import Interpolation
from ._variational_strategy import _VariationalStrategy


class GridInterpolationVariationalStrategy(_VariationalStrategy):
    def __init__(self, model, grid_size: int, grid_bounds, variational_distribution):
        grid_bounds = [tuple(b) for b in grid_bounds]
        num_dim = len(grid_bounds)
        grids = create_grid([int(grid_size)] * num_dim, grid_bounds, extend=True)
        inducing_points = create_data_from_grid(grids)
        super().__init__(model, inducing_points, variational_distribution, learn_inducing_locations=False)
        self.grids = list(grids)
        self.grid_size = int(grid_size)

    def _compute_grid(self, inputs):
        """Cubic interpolation coefficients W(x): (..., n, 4^d) indices/values
        (reference :62-75)."""
        n, d = inputs.shape[-2], inputs.shape[-1]
        batch = inputs.shape[:-2]
        flat = inputs.reshape((-1, d))
        idx, vals = Interpolation().interpolate(self.grids, flat)
        idx = idx.reshape(batch + (n, -1))
        vals = vals.reshape(batch + (n, -1))
        vd_batch = tuple(self._variational_distribution.batch_shape)
        if len(idx.shape[:-2]) != len(vd_batch):
            target = jnp.broadcast_shapes(idx.shape[:-2], vd_batch)
            idx = jnp.broadcast_to(idx, target + idx.shape[-2:])
            vals = jnp.broadcast_to(vals, target + vals.shape[-2:])
        return idx, vals

    def prior_distribution(self, model=None) -> MultivariateNormal:
        model = self._resolve_model(model)
        out = model.forward(self.inducing_points)
        # reference adds 1e-3 jitter here (grid K_ZZ is near-singular at fine resolution)
        return MultivariateNormal(out.loc, out.lazy_covariance_matrix.evaluate_kernel().add_jitter(1e-3))

    def forward(self, x, inducing_points, inducing_values, variational_inducing_covar=None, model=None, **kwargs):
        if variational_inducing_covar is None:
            raise RuntimeError(
                "GridInterpolationVariationalStrategy is only compatible with Gaussian variational "
                "distributions (got a Delta)."
            )
        idx, vals = self._compute_grid(x)
        pred_mean = left_interp(idx, vals, inducing_values[..., None])[..., 0]
        pred_covar = InterpolatedLinearOperator(variational_inducing_covar, idx, vals, idx, vals)
        return MultivariateNormal(pred_mean, pred_covar)


class AdditiveGridInterpolationVariationalStrategy(GridInterpolationVariationalStrategy):
    """Additive SKI: f(x) = Σ_d f_d(x_d) with one shared 1-d grid and a (num_dim,)-batched
    q(u) (reference: additive_grid_interpolation_variational_strategy.py:15)."""

    def __init__(self, model, grid_size: int, grid_bounds, num_dim: int,
                 variational_distribution, mixing_params: bool = False, sum_output: bool = True):
        if len(list(grid_bounds)) != 1:
            raise ValueError("Additive grid strategy uses a single shared 1-d grid (one bound pair)")
        super().__init__(model, grid_size, grid_bounds, variational_distribution)
        self.num_dim = int(num_dim)
        self.sum_output = bool(sum_output)
        if mixing_params:
            self.register_parameter(
                "mixing_params", jnp.ones((num_dim,), dtype=self.inducing_points.dtype) / num_dim
            )

    def _compute_grid(self, inputs):
        """Per-dimension 1-d interpolation: (num_dim, n, 4) coefficients (reference :44-53)."""
        n, d = inputs.shape[-2], inputs.shape[-1]
        flat = jnp.swapaxes(inputs, -1, -2).reshape((-1, 1))  # (d·n, 1), dim-major
        idx, vals = Interpolation().interpolate(self.grids, flat)
        idx = idx.reshape((d, n, -1))
        vals = vals.reshape((d, n, -1))
        if hasattr(self, "mixing_params"):
            vals = vals * self.mixing_params[:, None, None]
        return idx, vals

    def prior_distribution(self, model=None) -> MultivariateNormal:
        out = super().prior_distribution(model)
        mean = jnp.broadcast_to(out.loc, (self.num_dim,) + out.loc.shape[-1:])
        covar = out.lazy_covariance_matrix.expand((self.num_dim,) + out.lazy_covariance_matrix.matrix_shape)
        return MultivariateNormal(mean, covar)

    def kl_divergence(self, model=None):
        # q(u) factorizes over the num_dim batch → total KL is the sum over dimensions
        return jnp.sum(super().kl_divergence(model), axis=0)

    def forward(self, x, inducing_points, inducing_values, variational_inducing_covar=None, model=None, **kwargs):
        if x.ndim != 2:
            raise RuntimeError("AdditiveGridInterpolationVariationalStrategy expects a 2d input")
        n, d = x.shape
        if d != self.num_dim:
            raise RuntimeError(f"Expected {self.num_dim} input dims, got {d}")
        idx, vals = self._compute_grid(x)  # (d, n, 4)
        m = self.inducing_points.shape[-2]

        if not self.sum_output:
            pred_mean = left_interp(idx, vals, inducing_values[..., None])[..., 0]  # (d, n)
            if variational_inducing_covar is None:
                return Delta(pred_mean)
            return MultivariateNormal(
                pred_mean, InterpolatedLinearOperator(variational_inducing_covar, idx, vals, idx, vals)
            )

        # Σ_d W_d S_d W_dᵀ = W̃ blockdiag(S_1..S_d) W̃ᵀ with W̃ column indices offset by d·m
        offsets = (jnp.arange(d) * m)[:, None, None]
        idx_comb = jnp.swapaxes(idx + offsets, 0, 1).reshape(n, -1)  # (n, d·4)
        vals_comb = jnp.swapaxes(vals, 0, 1).reshape(n, -1)
        u_flat = inducing_values.reshape(-1)  # (d·m,)
        pred_mean = left_interp(idx_comb, vals_comb, u_flat[:, None])[..., 0]  # (n,)
        if variational_inducing_covar is None:
            return Delta(pred_mean)
        block_S = BlockDiagLinearOperator(variational_inducing_covar)
        pred_covar = InterpolatedLinearOperator(block_S, idx_comb, vals_comb, idx_comb, vals_comb)
        return MultivariateNormal(pred_mean, pred_covar)
