"""Structure-exploiting kernels over input dimensions.

References: gpytorch/kernels/additive_structure_kernel.py:10,
product_structure_kernel.py:12 (SKIP — arXiv 1802.08903),
newton_girard_additive_kernel.py:14.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..linop import LinearOperator, to_dense
from .kernel import Kernel


class AdditiveStructureKernel(Kernel):
    """Sum of the base kernel applied to each input dimension (reference :10)."""

    def __init__(self, base_kernel: Kernel, num_dims: int, active_dims=None, **kwargs):
        super().__init__(active_dims=active_dims, **kwargs)
        self.base_kernel = base_kernel
        self.num_dims = int(num_dims)

    @property
    def is_stationary(self):
        return self.base_kernel.is_stationary

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        if last_dim_is_batch:
            raise RuntimeError("AdditiveStructureKernel does not accept last_dim_is_batch")
        res = self.base_kernel.forward(x1, x2, diag=diag, last_dim_is_batch=True, **params)
        res = to_dense(res) if isinstance(res, LinearOperator) else res
        return jnp.sum(res, axis=-3 if not diag else -2)

    def num_outputs_per_input(self, x1, x2):
        return self.base_kernel.num_outputs_per_input(x1, x2)


class ProductStructureKernel(Kernel):
    """Product of the base kernel over input dimensions — enables SKIP
    (SKI per dimension × Hadamard product; reference :12)."""

    def __init__(self, base_kernel: Kernel, num_dims: int, active_dims=None, **kwargs):
        super().__init__(active_dims=active_dims, **kwargs)
        self.base_kernel = base_kernel
        self.num_dims = int(num_dims)

    @property
    def is_stationary(self):
        return self.base_kernel.is_stationary

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        if last_dim_is_batch:
            raise RuntimeError("ProductStructureKernel does not accept last_dim_is_batch")
        res = self.base_kernel.forward(x1, x2, diag=diag, last_dim_is_batch=True, **params)
        res = to_dense(res) if isinstance(res, LinearOperator) else res
        return jnp.prod(res, axis=-3 if not diag else -2)

    def num_outputs_per_input(self, x1, x2):
        return self.base_kernel.num_outputs_per_input(x1, x2)


class NewtonGirardAdditiveKernel(Kernel):
    """Additive kernel of all interaction orders up to max_degree, computed from per-dim
    kernels via Newton–Girard elementary symmetric polynomials (reference :14)."""

    def __init__(self, base_kernel: Kernel, num_dims: int, max_degree: Optional[int] = None, active_dims=None, **kwargs):
        super().__init__(active_dims=active_dims, **kwargs)
        self.base_kernel = base_kernel
        self.num_dims = int(num_dims)
        if max_degree is None:
            max_degree = num_dims
        self.max_degree = int(min(max_degree, num_dims))
        from ..constraints import Positive

        self.register_parameter("raw_outputscale", jnp.zeros(self.batch_shape + (self.max_degree,), dtype=self._param_dtype))
        self.register_constraint("raw_outputscale", Positive())

    @property
    def outputscale(self):
        return self._constrained("raw_outputscale")

    @outputscale.setter
    def outputscale(self, value):
        self._set_constrained("raw_outputscale", value)

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        if last_dim_is_batch:
            raise RuntimeError("NewtonGirardAdditiveKernel does not accept last_dim_is_batch")
        # per-dim kernels: (..., d, n, m) via last_dim_is_batch
        kern_values = self.base_kernel.forward(x1, x2, diag=diag, last_dim_is_batch=True, **params)
        kern_values = to_dense(kern_values) if isinstance(kern_values, LinearOperator) else kern_values
        dim_axis = -2 if diag else -3
        # power sums p_k = Σ_d z_d^k
        shape = list(kern_values.shape)
        shape[dim_axis] = self.max_degree + 1
        p = [jnp.sum(kern_values**k, axis=dim_axis) for k in range(self.max_degree + 1)]
        # Newton–Girard: e_0 = 1; e_k = (1/k) Σ_{i=1..k} (−1)^{i−1} e_{k−i} p_i
        e = [jnp.ones_like(p[1])]
        for kdeg in range(1, self.max_degree + 1):
            acc = jnp.zeros_like(p[1])
            for i in range(1, kdeg + 1):
                acc = acc + ((-1.0) ** (i - 1)) * e[kdeg - i] * p[i]
            e.append(acc / kdeg)
        scales = self.outputscale
        out = jnp.zeros_like(e[1])
        for kdeg in range(1, self.max_degree + 1):
            s = scales[..., kdeg - 1]
            out = out + jnp.reshape(s, s.shape + (1,) * (out.ndim - s.ndim)) * e[kdeg]
        return out

    def num_outputs_per_input(self, x1, x2):
        return 1
