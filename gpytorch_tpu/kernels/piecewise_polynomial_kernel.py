"""PiecewisePolynomialKernel — compactly-supported Wendland functions
(reference: gpytorch/kernels/piecewise_polynomial_kernel.py:31, q ∈ {0,1,2,3})."""

from __future__ import annotations

import math

import jax.numpy as jnp

from .kernel import Kernel


def _fmax(r, j, q):
    return jnp.maximum(jnp.zeros_like(r), 1.0 - r) ** (j + q)


def _get_cov(r, j, q):
    if q == 0:
        return _fmax(r, j, q)
    if q == 1:
        return _fmax(r, j, q) * ((j + 1) * r + 1)
    if q == 2:
        return _fmax(r, j, q) * ((j**2 + 4 * j + 3) / 3.0 * r**2 + (3 * j + 6) / 3.0 * r + 1)
    if q == 3:
        return _fmax(r, j, q) * (
            (j**3 + 9 * j**2 + 23 * j + 15) / 15.0 * r**3
            + (6 * j**2 + 36 * j + 45) / 15.0 * r**2
            + (15 * j + 45) / 15.0 * r
            + 1
        )
    raise ValueError("q must be in {0,1,2,3}")


class PiecewisePolynomialKernel(Kernel):
    has_lengthscale = True

    def __init__(self, q: int = 2, **kwargs):
        if q not in {0, 1, 2, 3}:
            raise ValueError("q expected to be 0, 1, 2 or 3")
        super().__init__(**kwargs)
        self.q = int(q)

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        x1_, x2_ = self._scale_inputs(x1, x2)
        if last_dim_is_batch:
            x1_ = jnp.swapaxes(x1_, -1, -2)[..., None]
            x2_ = jnp.swapaxes(x2_, -1, -2)[..., None]
            D = x1_.shape[-1]
        else:
            D = x1.shape[-1]
        j = math.floor(D / 2.0) + self.q + 1
        r = self.covar_dist(x1_, x2_, diag=diag)
        return _get_cov(r, j, self.q)
