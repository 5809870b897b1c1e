"""Cubic-convolution interpolation for SKI/KISS-GP (reference:
gpytorch/utils/interpolation.py — ``_cubic_interpolation_kernel`` :16, ``interpolate`` :44,
``left_interp`` :170, ``left_t_interp`` :179).

Each target point gets 4 weights per dimension (Keys' cubic convolution, a = −0.5), combined
into 4^d sparse coefficients by outer product.  The sparse matvecs live in ops/interp.py
(gather / segment-sum — the XLA-native ``dsmm``)."""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..ops.interp import left_interp, left_t_interp  # re-export (reference API parity)


def _cubic_interpolation_kernel(scaled_grid_dist: jax.Array) -> jax.Array:
    """Keys (1981) cubic convolution kernel with a = −0.5 (reference :16)."""
    U = jnp.abs(scaled_grid_dist)
    res = jnp.zeros_like(U)
    U_lt_1 = (U < 1).astype(U.dtype)
    res = res + (1.5 * U**3 - 2.5 * U**2 + 1) * U_lt_1
    U_ge_1_le_2 = ((U >= 1) & (U <= 2)).astype(U.dtype)
    res = res + (-0.5 * U**3 + 2.5 * U**2 - 4 * U + 2) * U_ge_1_le_2
    return res


class Interpolation:
    """Reference :15."""

    def interpolate(
        self, x_grid: List[jax.Array], x_target: jax.Array, eps: float = 1e-10
    ) -> Tuple[jax.Array, jax.Array]:
        """Return (indices, values) of shape (..., n, 4^d): W[i, indices[i,q]] = values[i,q].

        Combined grid index uses first-dimension-fastest ordering, matching
        ``utils.grid.create_data_from_grid``.
        """
        if x_target.ndim == 1:
            x_target = x_target[:, None]
        num_dim = x_target.shape[-1]
        batch = x_target.shape[:-2]
        n = x_target.shape[-2]
        dtype = x_target.dtype

        dim_interp_indices = []
        dim_interp_values = []
        strides = []
        stride = 1
        for d in range(num_dim):
            grid = x_grid[d]
            m = grid.shape[0]
            if m < 4:
                raise RuntimeError("SKI interpolation requires at least 4 grid points per dim")
            h = grid[1] - grid[0]
            x = x_target[..., d]
            # clamp target into the grid (reference raises; we clamp for jit-safety and
            # GridInterpolationKernel re-fits bounds dynamically like the reference)
            x = jnp.clip(x, grid[0], grid[-1])
            u = (x - grid[0]) / h  # fractional grid coordinate
            left = jnp.floor(u).astype(jnp.int32) - 1  # window start: i-1
            left = jnp.clip(left, 0, m - 4)
            offsets = jnp.arange(4)
            idx = left[..., None] + offsets  # (..., n, 4)
            dist = u[..., None] - idx.astype(dtype)  # scaled distance to each window point
            vals = _cubic_interpolation_kernel(dist)
            # normalize for exactness at clamped edges (interior windows already sum to 1)
            vals = vals / jnp.sum(vals, axis=-1, keepdims=True)
            dim_interp_indices.append(idx)
            dim_interp_values.append(vals)
            strides.append(stride)
            stride *= m

        # outer-product across dimensions → 4^d coefficients per point
        indices = dim_interp_indices[0] * strides[0]
        values = dim_interp_values[0]
        for d in range(1, num_dim):
            idx_d = dim_interp_indices[d] * strides[d]
            indices = indices[..., :, None] + idx_d[..., None, :]
            indices = indices.reshape(indices.shape[:-2] + (-1,))
            values = values[..., :, None] * dim_interp_values[d][..., None, :]
            values = values.reshape(values.shape[:-2] + (-1,))
        return indices, values
