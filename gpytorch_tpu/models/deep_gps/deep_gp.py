"""Deep GPs (reference: gpytorch/models/deep_gps/deep_gp.py — DeepGPLayer :33, DeepGP :115).

Each hidden layer is an ApproximateGP whose MVN output is *sampled* (rsample) before feeding
the next layer; the sample dimension (settings.num_likelihood_samples) is prepended once and
flows through every layer.  JAX: sampling needs explicit PRNG keys — pass ``key=`` through
``model(x, key=...)``; a fixed default key keeps eager exploration deterministic.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ... import settings
from ...distributions import MultitaskMultivariateNormal, MultivariateNormal
from ...linop import BlockDiagLinearOperator, DenseLinearOperator
from ..approximate_gp import ApproximateGP
from ..gp import GP


class DeepGPLayer(ApproximateGP):
    def __init__(self, variational_strategy, input_dims: Optional[int], output_dims: Optional[int]):
        super().__init__(variational_strategy)
        self.input_dims = input_dims
        self.output_dims = output_dims

    def __call__(self, inputs, *other_inputs, key=None, are_samples: bool = False, **kwargs):
        """Reference :77-113."""
        deterministic_inputs = not are_samples
        if isinstance(inputs, MultitaskMultivariateNormal):
            if key is None:
                key = jax.random.PRNGKey(0)
            inputs = inputs.rsample(key)  # (..., n, t)
            deterministic_inputs = False
        elif isinstance(inputs, MultivariateNormal):
            if key is None:
                key = jax.random.PRNGKey(0)
            inputs = inputs.rsample(key)[..., None]
            deterministic_inputs = False

        inputs = jnp.asarray(inputs)
        if inputs.ndim == 1:
            inputs = inputs[:, None]
        if settings.debug.on() and self.input_dims is not None:
            if inputs.shape[-1] != self.input_dims:
                raise RuntimeError(
                    f"Input shape did not match self.input_dims. Got total feature dims "
                    f"[{inputs.shape[-1]}], expected [{self.input_dims}]"
                )

        # batch the layer over output dims (reference :96-100)
        if self.output_dims is not None:
            inputs = jnp.broadcast_to(
                inputs[..., None, :, :], inputs.shape[:-2] + (self.output_dims,) + inputs.shape[-2:]
            )

        output = super().__call__(inputs, **kwargs)

        if self.output_dims is not None:
            # batch MVN over output dims → MultitaskMVN with BlockDiag covar, task-major
            # (non-interleaved) layout — reference :102-106
            mean = jnp.swapaxes(output.loc, -1, -2)  # (..., n, t)
            covar = BlockDiagLinearOperator(DenseLinearOperator(output.covariance_matrix))
            output = MultitaskMultivariateNormal(mean, covar, interleaved=False)

        # expand deterministic inputs by the likelihood-sample dim (reference :108-111)
        if deterministic_inputs:
            output = output.expand((settings.num_likelihood_samples.value(),) + tuple(output.batch_shape))
        return output


class DeepGP(GP):
    """Container for DeepGPLayers (reference :115); user implements ``forward``."""

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def deep_kl_divergence(self):
        """Sum of KL terms over all layers (reference mlls/deep_approximate_mll.py)."""
        total = None
        for module in self.modules():
            if isinstance(module, ApproximateGP):
                kl = module.variational_strategy.kl_divergence(model=module)
                kl = jnp.sum(kl)
                total = kl if total is None else total + kl
        return total


class DeepLikelihood:
    """Deprecated in the reference (deep_gp.py:130); use the MLL's sample-mean instead."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError("DeepLikelihood is deprecated — use DeepApproximateMLL")
