"""MultitaskMean (reference: gpytorch/means/multitask_mean.py:13)."""

from __future__ import annotations

import copy

import jax.numpy as jnp

from .mean import Mean


class MultitaskMean(Mean):
    def __init__(self, base_means, num_tasks: int):
        super().__init__()
        if isinstance(base_means, Mean):
            base_means = [base_means] + [copy.deepcopy(base_means) for _ in range(num_tasks - 1)]
        if len(base_means) != num_tasks:
            raise RuntimeError("base_means must have length num_tasks")
        self.base_means = list(base_means)
        self.num_tasks = int(num_tasks)

    def forward(self, x):
        return jnp.stack([m(x) for m in self.base_means], axis=-1)  # (..., n, t)
