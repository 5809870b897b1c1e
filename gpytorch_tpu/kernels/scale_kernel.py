"""ScaleKernel and ConstantKernel (reference: gpytorch/kernels/scale_kernel.py:13,
constant_kernel.py:13)."""

from __future__ import annotations

import jax.numpy as jnp

from ..constraints import Positive
from ..linop import LinearOperator
from .kernel import Kernel


class ScaleKernel(Kernel):
    def __init__(self, base_kernel: Kernel, outputscale_prior=None, outputscale_constraint=None, **kwargs):
        super().__init__(**kwargs)
        self.base_kernel = base_kernel
        self.register_parameter("raw_outputscale", jnp.zeros(self.batch_shape, dtype=self._param_dtype))
        self.register_constraint("raw_outputscale", outputscale_constraint or Positive())
        if outputscale_prior is not None:
            self.register_prior(
                "outputscale_prior",
                outputscale_prior,
                lambda m: m.outputscale,
                lambda m, v: m._set_constrained("raw_outputscale", v),
            )

    @property
    def is_stationary(self):
        return self.base_kernel.is_stationary

    @property
    def returns_lazy_structure(self):
        return getattr(self.base_kernel, "returns_lazy_structure", False)

    @property
    def outputscale(self):
        return self._constrained("raw_outputscale")

    @outputscale.setter
    def outputscale(self, value):
        self._set_constrained("raw_outputscale", value)

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        base = self.base_kernel.forward(x1, x2, diag=diag, last_dim_is_batch=last_dim_is_batch, **params)
        scale = self.outputscale
        if last_dim_is_batch:
            scale = scale[..., None]
        if isinstance(base, LinearOperator):
            if diag:
                base = base._diagonal()
            else:
                extra = base.ndim - scale.ndim
                return base * jnp.reshape(scale, scale.shape + (1,) * extra) if scale.ndim else base * scale
        extra = base.ndim - scale.ndim
        return base * jnp.reshape(scale, scale.shape + (1,) * extra)

    def num_outputs_per_input(self, x1, x2):
        return self.base_kernel.num_outputs_per_input(x1, x2)

    def prediction_strategy(self, train_inputs, train_prior_dist, train_labels, likelihood):
        return self.base_kernel.prediction_strategy(train_inputs, train_prior_dist, train_labels, likelihood)


class ConstantKernel(Kernel):
    """k(x, x') = c (reference: gpytorch/kernels/constant_kernel.py:13)."""

    def __init__(self, constant_prior=None, constant_constraint=None, **kwargs):
        super().__init__(**kwargs)
        self.register_parameter("raw_constant", jnp.zeros(self.batch_shape + (1,), dtype=self._param_dtype))
        self.register_constraint("raw_constant", constant_constraint or Positive())
        if constant_prior is not None:
            self.register_prior(
                "constant_prior",
                constant_prior,
                lambda m: m.constant,
                lambda m, v: m._set_constrained("raw_constant", v),
            )

    @property
    def constant(self):
        return self._constrained("raw_constant")

    @constant.setter
    def constant(self, value):
        self._set_constrained("raw_constant", value)

    @property
    def is_stationary(self):
        return True

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        c = self.constant  # (*batch, 1)
        if last_dim_is_batch:
            shape = x1.shape[:-2] + (x1.shape[-1], x1.shape[-2]) + (() if diag else (x2.shape[-2],))
        else:
            shape = jnp.broadcast_shapes(x1.shape[:-2], x2.shape[:-2]) + ((x1.shape[-2],) if diag else (x1.shape[-2], x2.shape[-2]))
        shape = tuple(jnp.broadcast_shapes(self.batch_shape, shape[: len(shape) - (1 if diag else 2)])) + shape[len(shape) - (1 if diag else 2):]
        extra = len(shape) - c.ndim
        c = jnp.reshape(c, c.shape[:-1] + (1,) * (extra + 1))
        return jnp.broadcast_to(c, shape)
