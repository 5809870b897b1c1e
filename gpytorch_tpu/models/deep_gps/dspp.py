"""DSPP — deep sigma point processes (reference: gpytorch/models/deep_gps/dspp.py —
DSPPLayer :14, DSPP :98): deterministic Gauss-Hermite quadrature sites replace sampling
(:52-58), with learned softmax quadrature weights (:114)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ... import settings
from ...distributions import MultitaskMultivariateNormal, MultivariateNormal
from ...linop import BlockDiagLinearOperator, DenseLinearOperator
from ..approximate_gp import ApproximateGP
from .deep_gp import DeepGP, DeepGPLayer


class DSPPLayer(DeepGPLayer):
    def __init__(self, variational_strategy, input_dims, output_dims, num_quad_sites: int = 8, quad_sites=None):
        super().__init__(variational_strategy, input_dims, output_dims)
        self.num_quad_sites = int(num_quad_sites)
        if quad_sites is None:
            locs, _ = np.polynomial.hermite_e.hermegauss(self.num_quad_sites)
            quad_sites = jnp.asarray(locs)
        self.register_parameter("quad_sites", jnp.asarray(quad_sites))

    def __call__(self, inputs, *other_inputs, key=None, **kwargs):
        """Reference :49-96 — sigma-point propagation instead of sampling."""
        if isinstance(inputs, MultitaskMultivariateNormal):
            # deterministic quadrature sites: x = μ + q·σ (reference :52-58)
            mean = inputs.mean  # (Q, ..., n, t) on later layers or (..., n, t) on first
            std = jnp.sqrt(inputs.variance)
            q = self.quad_sites.reshape((self.num_quad_sites,) + (1,) * mean.ndim)
            if mean.ndim >= 3 and mean.shape[0] == self.num_quad_sites:
                # already has a quad-site dim: apply sites elementwise per existing site
                q = self.quad_sites.reshape((self.num_quad_sites,) + (1,) * (mean.ndim - 1))
                inputs = mean + q * std
            else:
                inputs = mean[None] + q * std[None]
            are_samples = True
        else:
            are_samples = False
        inputs = jnp.asarray(inputs) if not isinstance(inputs, MultivariateNormal) else inputs
        if isinstance(inputs, jax.Array):
            if inputs.ndim == 1:
                inputs = inputs[:, None]
            if self.output_dims is not None:
                x = jnp.broadcast_to(
                    inputs[..., None, :, :], inputs.shape[:-2] + (self.output_dims,) + inputs.shape[-2:]
                )
            else:
                x = inputs
            output = ApproximateGP.__call__(self, x, **kwargs)
            if self.output_dims is not None:
                mean = jnp.swapaxes(output.loc, -1, -2)
                covar = BlockDiagLinearOperator(DenseLinearOperator(output.covariance_matrix))
                output = MultitaskMultivariateNormal(mean, covar, interleaved=False)
            if not are_samples and self.num_quad_sites > 0:
                output = output.expand((self.num_quad_sites,) + tuple(output.batch_shape))
            return output
        raise RuntimeError("DSPPLayer inputs must be an array or MultitaskMultivariateNormal")


class DSPP(DeepGP):
    """Reference :98 — holds learned (softmax-normalized log) quadrature weights."""

    def __init__(self, num_quad_sites: int):
        super().__init__()
        self.num_quad_sites = int(num_quad_sites)
        self.register_parameter("raw_quad_weights", jnp.zeros((num_quad_sites,)))

    @property
    def quad_weights(self):
        return jax.nn.log_softmax(self.raw_quad_weights, axis=-1)
