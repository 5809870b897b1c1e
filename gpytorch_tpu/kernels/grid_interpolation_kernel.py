"""GridInterpolationKernel — SKI / KISS-GP (reference:
gpytorch/kernels/grid_interpolation_kernel.py:16): K ≈ W K_grid Wᵀ with W the sparse cubic
interpolation matrix (4^d nonzeros per row) and K_grid a Toeplitz⊗...⊗Toeplitz GridKernel.
Returns an InterpolatedLinearOperator (:199) so CG matvecs are  gather → FFT/Kron matvec →
scatter-add, all XLA-native."""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..linop import InterpolatedLinearOperator
from ..utils.grid import create_grid
from ..utils.interpolation import Interpolation
from .grid_kernel import GridKernel
from .kernel import Kernel


class GridInterpolationKernel(GridKernel):
    def __init__(
        self,
        base_kernel: Kernel,
        grid_size,
        num_dims: Optional[int] = None,
        grid_bounds: Optional[List[Tuple[float, float]]] = None,
        **kwargs,
    ):
        has_initialized_grid = 0
        grid_is_dynamic = True
        if grid_bounds is None:
            bounds = tuple((-10.0, 10.0) for _ in range(num_dims))
        else:
            has_initialized_grid = 1
            grid_is_dynamic = False
            if num_dims is None:
                num_dims = len(grid_bounds)
            elif num_dims != len(grid_bounds):
                raise RuntimeError("num_dims disagrees with grid_bounds")
            bounds = tuple(tuple(b) for b in grid_bounds)
        if num_dims is None:
            raise RuntimeError("num_dims must be supplied if grid_bounds is omitted")

        if isinstance(grid_size, int):
            grid_sizes = [grid_size] * num_dims
        else:
            grid_sizes = list(grid_size)
        if len(grid_sizes) != num_dims:
            raise RuntimeError("grid_size length disagrees with num_dims")

        dtype = kwargs.get("dtype", jnp.float32)
        grid = create_grid(grid_sizes, list(bounds), dtype=dtype)
        super().__init__(base_kernel=base_kernel, grid=grid, interpolation_mode=True, **kwargs)
        self.grid_is_dynamic = grid_is_dynamic
        self.grid_sizes = tuple(grid_sizes)
        self.grid_bounds = bounds
        self.register_buffer("has_initialized_grid", jnp.asarray(has_initialized_grid, dtype=jnp.int32))

    @property
    def _tight_grid_bounds(self):
        grid_spacings = tuple((b[1] - b[0]) / gs for gs, b in zip(self.grid_sizes, self.grid_bounds))
        return tuple(
            (b[0] + 2.01 * s, b[1] - 2.01 * s) for b, s in zip(self.grid_bounds, grid_spacings)
        )

    def _compute_grid(self, inputs, last_dim_is_batch=False):
        """Sparse interpolation coefficients for inputs (reference :132)."""
        if inputs.ndim == 1:
            inputs = inputs[:, None]
        batch = inputs.shape[:-2]
        n, d = inputs.shape[-2:]
        if last_dim_is_batch:
            inputs = jnp.swapaxes(inputs, -1, -2)[..., None]  # (..., d, n, 1)
            idxs = []
            vals = []
            for dd in range(d):
                # a 1-d grid kernel used through AdditiveStructureKernel (SKIP) applies its
                # single grid to EVERY input dimension (reference grid_interpolation_kernel
                # forward with last_dim_is_batch)
                grid_d = self.grid[dd] if dd < len(self.grid) else self.grid[0]
                i, v = Interpolation().interpolate([grid_d], inputs[..., dd, :, :])
                idxs.append(i)
                vals.append(v)
            return jnp.stack(idxs, axis=-3), jnp.stack(vals, axis=-3)
        return Interpolation().interpolate(self.grid, inputs)

    def _inducing_forward(self, last_dim_is_batch, **params):
        return super().forward(None, None, diag=False, last_dim_is_batch=last_dim_is_batch, **params)

    def _update_dynamic_grid(self, x1, x2):
        """Re-fit grid bounds when inputs leave the current grid (reference :148-182).
        Mutation happens eagerly only (concrete arrays); under jit we clamp instead."""
        if not self.grid_is_dynamic:
            return
        if isinstance(x1, jax.core.Tracer) or isinstance(x2, jax.core.Tracer):
            return
        # numpy, not jnp: under a jit trace every jnp op stages out a tracer even when its
        # operands are concrete closure constants, and the grid refresh needs host floats
        import numpy as np

        x1n = np.asarray(x1)
        x2n = np.asarray(x2)
        if x1n.ndim == 1:
            x1n = x1n[:, None]
        if x2n.ndim == 1:
            x2n = x2n[:, None]
        x = (
            x1n
            if x1 is x2
            else np.concatenate([x1n.reshape(-1, x1n.shape[-1]), x2n.reshape(-1, x2n.shape[-1])], axis=-2)
        )
        mins = np.min(x.reshape(-1, x.shape[-1]), axis=0)
        maxs = np.max(x.reshape(-1, x.shape[-1]), axis=0)
        needs_update = int(self.has_initialized_grid) == 0 or any(
            float(mins[i]) < self._tight_grid_bounds[i][0] or float(maxs[i]) > self._tight_grid_bounds[i][1]
            for i in range(self.num_dims)
        )
        if not needs_update:
            return
        spacings = tuple((float(maxs[i]) - float(mins[i])) / (self.grid_sizes[i] - 4.02) for i in range(self.num_dims))
        bounds = tuple(
            (float(mins[i]) - 2.01 * spacings[i], float(maxs[i]) + 2.01 * spacings[i]) for i in range(self.num_dims)
        )
        self.grid_bounds = bounds
        grid = create_grid(list(self.grid_sizes), list(bounds), extend=False, dtype=x1.dtype)
        self.update_grid(grid)
        import numpy as _np

        self.has_initialized_grid = _np.asarray(1, dtype=_np.int32)

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        self._update_dynamic_grid(x1, x2)
        base_lazy = self._inducing_forward(last_dim_is_batch=last_dim_is_batch, **params)
        left_idx, left_val = self._compute_grid(x1, last_dim_is_batch)
        if x1 is x2 or (x1.shape == x2.shape and x1 is x2):
            right_idx, right_val = left_idx, left_val
        else:
            right_idx, right_val = self._compute_grid(x2, last_dim_is_batch)
        res = InterpolatedLinearOperator(
            base_lazy, left_idx, left_val.astype(x1.dtype), right_idx, right_val.astype(x1.dtype)
        )
        return res._diagonal() if diag else res

    def prediction_strategy(self, train_inputs, train_prior_dist, train_labels, likelihood):
        from ..models.exact_prediction_strategies import InterpolatedPredictionStrategy

        return InterpolatedPredictionStrategy(train_inputs, train_prior_dist, train_labels, likelihood)

    def num_outputs_per_input(self, x1, x2):
        return 1
