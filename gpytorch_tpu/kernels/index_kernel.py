"""IndexKernel — low-rank + diagonal task covariance B Bᵀ + diag(v)
(reference: gpytorch/kernels/index_kernel.py:18; covar_matrix :91)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constraints import Positive
from ..linop import DenseLinearOperator
from .kernel import Kernel


class IndexKernel(Kernel):
    def __init__(self, num_tasks: int, rank: int = 1, prior=None, var_constraint=None, **kwargs):
        if rank > num_tasks:
            raise RuntimeError("Cannot create a task covariance matrix larger than the number of tasks")
        super().__init__(**kwargs)
        self.num_tasks = int(num_tasks)
        self.rank = int(rank)
        self.register_parameter(
            "covar_factor",
            jax.random.normal(jax.random.PRNGKey(0), self.batch_shape + (num_tasks, rank), dtype=self._param_dtype),
        )
        self.register_parameter("raw_var", jnp.zeros(self.batch_shape + (num_tasks,), dtype=self._param_dtype))
        self.register_constraint("raw_var", var_constraint or Positive())
        if prior is not None:
            self.register_prior("IndexKernelPrior", prior, lambda m: m._eval_covar_matrix(), None)

    @property
    def var(self):
        return self._constrained("raw_var")

    @var.setter
    def var(self, value):
        self._set_constrained("raw_var", value)

    def _eval_covar_matrix(self):
        cf = self.covar_factor
        return cf @ jnp.swapaxes(cf, -1, -2) + self.var[..., None] * jnp.eye(
            self.num_tasks, dtype=cf.dtype
        )

    @property
    def covar_matrix(self):
        return DenseLinearOperator(self._eval_covar_matrix())

    def forward(self, i1, i2, diag=False, last_dim_is_batch=False, **params):
        i1 = jnp.asarray(i1).astype(jnp.int32)
        i2 = jnp.asarray(i2).astype(jnp.int32)
        if i1.ndim >= 2 and i1.shape[-1] == 1:
            i1 = i1[..., 0]
        if i2.ndim >= 2 and i2.shape[-1] == 1:
            i2 = i2[..., 0]
        covar = self._eval_covar_matrix()  # (..., t, t)
        if diag:
            return covar[..., i1, i2] if covar.ndim == 2 else jnp.take_along_axis(
                jnp.take_along_axis(covar, i1[..., :, None], axis=-2), i2[..., :, None], axis=-1
            )[..., 0]
        if covar.ndim == 2:
            return covar[i1[..., :, None], i2[..., None, :]]
        rows = jnp.take_along_axis(covar, i1[..., :, None].astype(jnp.int32), axis=-2)
        return jnp.take_along_axis(rows, i2[..., None, :].astype(jnp.int32), axis=-1)
