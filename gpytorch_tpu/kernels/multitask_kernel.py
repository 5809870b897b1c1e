"""MultitaskKernel — K_data ⊗ K_task (reference: gpytorch/kernels/multitask_kernel.py:13;
Kronecker assembly :46-55) and LCMKernel (reference: gpytorch/kernels/lcm_kernel.py:14)."""

from __future__ import annotations

import copy
from typing import List

import jax.numpy as jnp

from ..linop import KroneckerProductLinearOperator, to_linear_operator
from .index_kernel import IndexKernel
from .kernel import Kernel


class MultitaskKernel(Kernel):
    returns_lazy_structure = True
    def __init__(self, data_covar_module: Kernel, num_tasks: int, rank: int = 1, task_covar_prior=None, **kwargs):
        super().__init__(**kwargs)
        self.task_covar_module = IndexKernel(
            num_tasks=num_tasks, rank=rank, prior=task_covar_prior, batch_shape=self.batch_shape
        )
        self.data_covar_module = data_covar_module
        self.num_tasks = int(num_tasks)

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        if last_dim_is_batch:
            raise RuntimeError("MultitaskKernel does not accept the last_dim_is_batch argument.")
        covar_i = self.task_covar_module.covar_matrix  # (..., t, t)
        covar_x = to_linear_operator(self.data_covar_module.forward(x1, x2, **params))
        # interleaved layout: (n·t) with task index fastest → K_data ⊗ K_task
        res = KroneckerProductLinearOperator(covar_x, covar_i)
        return res._diagonal() if diag else res

    def num_outputs_per_input(self, x1, x2):
        return self.num_tasks


class LCMKernel(Kernel):
    returns_lazy_structure = True
    """Sum of MultitaskKernels — linear model of coregionalisation (reference: lcm_kernel.py:14)."""

    def __init__(self, base_kernels: List[Kernel], num_tasks: int, rank=1, task_covar_prior=None, **kwargs):
        if not isinstance(base_kernels, (list, tuple)) or len(base_kernels) < 1:
            raise RuntimeError("base_kernels must be a nonempty list")
        super().__init__(**kwargs)
        if not isinstance(rank, (list, tuple)):
            rank = [rank] * len(base_kernels)
        self.covar_module_list = [
            MultitaskKernel(k, num_tasks=num_tasks, rank=r, task_covar_prior=task_covar_prior)
            for k, r in zip(base_kernels, rank)
        ]
        self.num_tasks = int(num_tasks)

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        res = self.covar_module_list[0].forward(x1, x2, diag=diag, last_dim_is_batch=last_dim_is_batch, **params)
        for m in self.covar_module_list[1:]:
            nxt = m.forward(x1, x2, diag=diag, last_dim_is_batch=last_dim_is_batch, **params)
            res = res + nxt
        return res

    def num_outputs_per_input(self, x1, x2):
        return self.num_tasks
