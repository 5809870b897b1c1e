"""ApproximateGP (reference: gpytorch/models/approximate_gp.py:16)."""

from __future__ import annotations

import jax.numpy as jnp

from .gp import GP


class ApproximateGP(GP):
    def __init__(self, variational_strategy):
        super().__init__()
        self.variational_strategy = variational_strategy

    def forward(self, x):
        raise NotImplementedError

    def pyro_guide(self, input, beta=1.0, name_prefix=""):
        raise NotImplementedError("Use gpytorch_tpu.models.pyro with NumPyro integration")

    def pyro_model(self, input, beta=1.0, name_prefix=""):
        raise NotImplementedError("Use gpytorch_tpu.models.pyro with NumPyro integration")

    def get_fantasy_model(self, inputs, targets, **kwargs):
        return self.variational_strategy.get_fantasy_model(inputs, targets, **kwargs)

    def __call__(self, inputs, prior: bool = False, **kwargs):
        """Reference :113."""
        inputs = jnp.asarray(inputs)
        if inputs.ndim == 1:
            inputs = inputs[:, None]
        return self.variational_strategy(inputs, prior=prior, model=self, **kwargs)
