"""Grid utilities (reference: gpytorch/utils/grid.py — ScaleToBounds :11,
choose_grid_size :80, create_data_from_grid :107, create_grid :130)."""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.module import Module


class ScaleToBounds(Module):
    """Scale inputs into (lower, upper) (reference :11).  Bounds are fit on the first
    training-mode call and reused at eval time."""

    def __init__(self, lower_bound: float, upper_bound: float):
        super().__init__()
        self.lower_bound = float(lower_bound)
        self.upper_bound = float(upper_bound)
        self.register_buffer("min_val", jnp.asarray(lower_bound))
        self.register_buffer("max_val", jnp.asarray(upper_bound))

    def forward(self, x):
        if self.training:
            min_val = jnp.min(x)
            max_val = jnp.max(x)
            self.min_val = min_val
            self.max_val = max_val
        else:
            min_val = self.min_val
            max_val = self.max_val
        diff = max_val - min_val
        x = (x - min_val) * (0.95 * (self.upper_bound - self.lower_bound) / diff) + 0.95 * self.lower_bound
        return x


def choose_grid_size(train_inputs, ratio: float = 1.0, kronecker_structure: bool = True) -> int:
    """Reference :80."""
    num_data = train_inputs.shape[0] if train_inputs.ndim == 1 else train_inputs.shape[-2]
    num_dim = 1 if train_inputs.ndim == 1 else train_inputs.shape[-1]
    if kronecker_structure:
        return int(ratio * math.pow(num_data, 1.0 / num_dim))
    return int(ratio * num_data)


def convert_legacy_grid(grid) -> List[jax.Array]:
    return [grid[:, i] for i in range(grid.shape[-1])]


def create_data_from_grid(grid) -> jax.Array:
    """Cartesian product of per-dim grids, first dimension varying fastest (reference :107).

    Built in numpy so grid (re)construction stays concrete even when it happens inside a
    jit trace (dynamic grid refresh mutates module state, which must never hold tracers)."""
    import numpy as np

    if not isinstance(grid, (list, tuple)):
        grid = convert_legacy_grid(grid)
    grid = [np.asarray(g) for g in grid]
    projections = np.meshgrid(*grid, indexing="ij")
    grid_tensor = np.stack(projections, axis=-1)
    ndims = len(grid)
    # iterate first data dimension fastest (legacy reference ordering)
    perm = tuple(reversed(range(ndims + 1)))
    return np.swapaxes(np.transpose(grid_tensor, perm).reshape(ndims, -1), 0, 1)


def create_grid(
    grid_sizes: List[int],
    grid_bounds: List[Tuple[float, float]],
    extend: bool = True,
    dtype=jnp.float32,
):
    """Per-dim 1D grids, optionally extended one step past each bound (reference :130).

    Returns concrete numpy arrays (see create_data_from_grid) — downstream jnp ops treat
    them as constants whether eager or traced."""
    import numpy as np

    np_dtype = np.dtype(jnp.zeros((), dtype).dtype.name)
    grid = []
    for i in range(len(grid_bounds)):
        grid_diff = float(grid_bounds[i][1] - grid_bounds[i][0]) / (grid_sizes[i] - 2)
        if extend:
            proj = np.linspace(
                grid_bounds[i][0] - grid_diff, grid_bounds[i][1] + grid_diff, grid_sizes[i], dtype=np_dtype
            )
        else:
            proj = np.linspace(grid_bounds[i][0], grid_bounds[i][1], grid_sizes[i], dtype=np_dtype)
        grid.append(proj)
    return grid
