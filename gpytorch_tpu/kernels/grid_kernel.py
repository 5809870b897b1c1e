"""GridKernel — stationary kernel on a Cartesian grid: Toeplitz per dim, Kronecker across
dims (reference: gpytorch/kernels/grid_kernel.py:17; Toeplitz :152, Kronecker :159; note the
first-dimension-fastest grid ordering matches utils.grid.create_data_from_grid)."""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from .. import settings
from ..linop import KroneckerProductLinearOperator, ToeplitzLinearOperator, to_dense
from ..utils.grid import create_data_from_grid
from .kernel import Kernel


class GridKernel(Kernel):
    is_stationary_structure = True
    returns_lazy_structure = True

    def __init__(self, base_kernel: Kernel, grid: List[jax.Array], interpolation_mode: bool = False, **kwargs):
        if not base_kernel.is_stationary:
            raise RuntimeError("The base_kernel for GridKernel must be stationary.")
        super().__init__(**kwargs)
        self.base_kernel = base_kernel
        self.interpolation_mode = bool(interpolation_mode)
        if not isinstance(grid, (list, tuple)):
            from ..utils.grid import convert_legacy_grid

            grid = convert_legacy_grid(grid)
        self.grid = [jnp.asarray(proj) for proj in grid]
        if not self.interpolation_mode:
            self.register_buffer("full_grid", create_data_from_grid(self.grid))

    @property
    def num_dims(self) -> int:
        return len(self.grid)

    def update_grid(self, grid):
        if not isinstance(grid, (list, tuple)):
            from ..utils.grid import convert_legacy_grid

            grid = convert_legacy_grid(grid)
        # numpy: update_grid mutates module state, which must stay concrete even when the
        # call happens inside a jit trace (e.g. GridInterpolationKernel's dynamic refresh)
        import numpy as np

        self.grid = [np.asarray(p) for p in grid]
        if not self.interpolation_mode:
            self.full_grid = create_data_from_grid(self.grid)
        self.clear_caches()
        return self

    def _create_or_get_full_grid(self):
        return create_data_from_grid(self.grid)

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        grid = self.grid
        if diag:
            return self.base_kernel.forward(x1, x2, diag=True, last_dim_is_batch=last_dim_is_batch, **params)
        grid_numel = 1
        for g in grid:
            grid_numel *= g.shape[0]
        on_grid = self.interpolation_mode or (x1.shape[-2] == x2.shape[-2] and x1.shape[-2] == grid_numel)
        if not on_grid:
            return self.base_kernel.forward(x1, x2, diag=diag, last_dim_is_batch=last_dim_is_batch, **params)

        if settings.use_toeplitz.on():
            # per-dim Toeplitz from k(g_d[0], g_d) (reference :140-159)
            covars = []
            for d, proj in enumerate(grid):
                first = proj[:1, None]
                rest = proj[:, None]
                col = to_dense(self.base_kernel.forward(first, rest, **params))[..., 0, :]
                covars.append(ToeplitzLinearOperator(col))
        else:
            covars = []
            for proj in grid:
                pts = proj[:, None]
                covars.append(self.base_kernel(pts, pts))
        if len(covars) == 1:
            return covars[0] if not last_dim_is_batch else jnp.stack([to_dense(covars[0])], axis=-3)
        if last_dim_is_batch:
            return jnp.stack([to_dense(c) for c in covars], axis=-3)
        # reversed order → first grid dimension varies fastest (standard kron semantics here)
        return KroneckerProductLinearOperator(*covars[::-1])

    def num_outputs_per_input(self, x1, x2):
        return self.base_kernel.num_outputs_per_input(x1, x2)
