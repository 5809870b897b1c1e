"""Gauss-Hermite quadrature (reference: gpytorch/utils/quadrature.py:27)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import settings
from ..core.module import Module


class GaussHermiteQuadrature1D(Module):
    """E[func(f)] for f ~ N(mu, sigma²) elementwise over a (possibly multivariate-diagonal)
    Normal batch (reference :53-76)."""

    def __init__(self, num_locs=None):
        super().__init__()
        if num_locs is None:
            num_locs = settings.num_gauss_hermite_locs.value()
        self.num_locs = int(num_locs)
        locs, weights = np.polynomial.hermite_e.hermegauss(self.num_locs)
        # normalize: E[f(x)] = (1/sqrt(2π)) Σ w_i f(x_i) for probabilists' Hermite
        self.register_buffer("locations", jnp.asarray(locs))
        self.register_buffer("weights", jnp.asarray(weights / math.sqrt(2 * math.pi)))

    def forward(self, func, gaussian_dists):
        mean = gaussian_dists.mean
        std = jnp.sqrt(gaussian_dists.variance)
        locs = self.locations.astype(mean.dtype).reshape((self.num_locs,) + (1,) * mean.ndim)
        shifted = mean + std * locs  # (q, ...)
        vals = func(shifted)  # (q, ...)
        w = self.weights.astype(mean.dtype).reshape((self.num_locs,) + (1,) * (vals.ndim - 1))
        return jnp.sum(vals * w, axis=0)

    def __call__(self, func, gaussian_dists):
        return self.forward(func, gaussian_dists)
