"""Core stationary kernels: RBF, Matérn, RQ, Periodic, Cosine.

Reference: gpytorch/kernels/{rbf,matern,rq,periodic,cosine}_kernel.py and the fused
custom-autograd covariance functions in gpytorch/functions/{rbf,matern}_covariance.py.
In JAX the fused forward+backward comes from XLA fusion + our Pallas kernels, so no
hand-written backward is needed.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..constraints import Interval, Positive
from .kernel import Kernel


def _maybe_last_dim_batch(x1, x2, last_dim_is_batch):
    if last_dim_is_batch:
        x1 = jnp.swapaxes(x1, -1, -2)[..., None]
        x2 = jnp.swapaxes(x2, -1, -2)[..., None]
    return x1, x2


def postprocess_rbf(dist_mat):
    """exp(-d2/2) (reference: rbf_kernel.py:10-11)."""
    import jax.numpy as jnp

    return jnp.exp(dist_mat / -2.0)


class RBFKernel(Kernel):
    """k(x, x') = exp(−½‖(x−x')/ℓ‖²) (reference: gpytorch/kernels/rbf_kernel.py:14)."""

    has_lengthscale = True

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        x1_, x2_ = self._scale_inputs(x1, x2)
        x1_, x2_ = _maybe_last_dim_batch(x1_, x2_, last_dim_is_batch)
        d2 = self.covar_dist(x1_, x2_, diag=diag, square_dist=True)
        return jnp.exp(-0.5 * d2)


class MaternKernel(Kernel):
    """Matérn with ν ∈ {0.5, 1.5, 2.5} (reference: gpytorch/kernels/matern_kernel.py:14;
    closed forms in gpytorch/functions/matern_covariance.py:23-51)."""

    has_lengthscale = True

    def __init__(self, nu: float = 2.5, **kwargs):
        if nu not in (0.5, 1.5, 2.5):
            raise RuntimeError("nu must be one of 0.5, 1.5, 2.5")
        super().__init__(**kwargs)
        self.nu = nu

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        x1_, x2_ = self._scale_inputs(x1, x2)
        x1_, x2_ = _maybe_last_dim_batch(x1_, x2_, last_dim_is_batch)
        r = self.covar_dist(x1_, x2_, diag=diag, square_dist=False)
        if self.nu == 0.5:
            return jnp.exp(-r)
        if self.nu == 1.5:
            s = math.sqrt(3) * r
            return (1.0 + s) * jnp.exp(-s)
        s = math.sqrt(5) * r
        return (1.0 + s + s * s / 3.0) * jnp.exp(-s)


class RQKernel(Kernel):
    """Rational quadratic (reference: gpytorch/kernels/rq_kernel.py:9)."""

    has_lengthscale = True

    def __init__(self, alpha_constraint=None, **kwargs):
        super().__init__(**kwargs)
        self.register_parameter("raw_alpha", jnp.zeros(self.batch_shape + (1,), dtype=self._param_dtype))
        self.register_constraint("raw_alpha", alpha_constraint or Positive())

    @property
    def alpha(self):
        return self._constrained("raw_alpha")

    @alpha.setter
    def alpha(self, value):
        self._set_constrained("raw_alpha", value)

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        x1_, x2_ = self._scale_inputs(x1, x2)
        x1_, x2_ = _maybe_last_dim_batch(x1_, x2_, last_dim_is_batch)
        d2 = self.covar_dist(x1_, x2_, diag=diag, square_dist=True)
        alpha = self.alpha
        for _ in range(d2.ndim - len(self.batch_shape) - 1):
            alpha = alpha[..., None]
        return jnp.power(1.0 + d2 / (2.0 * alpha), -alpha)


class PeriodicKernel(Kernel):
    """k(x,x') = exp(−2 Σ_d sin²(π (x_d−x'_d)/p) / ℓ²) (reference:
    gpytorch/kernels/periodic_kernel.py:14)."""

    has_lengthscale = True

    def __init__(self, period_length_prior=None, period_length_constraint=None, **kwargs):
        super().__init__(**kwargs)
        num_dims = 1 if self.ard_num_dims is None else self.ard_num_dims
        self.register_parameter("raw_period_length", jnp.zeros(self.batch_shape + (1, num_dims), dtype=self._param_dtype))
        self.register_constraint("raw_period_length", period_length_constraint or Positive())
        if period_length_prior is not None:
            self.register_prior(
                "period_length_prior",
                period_length_prior,
                lambda m: m.period_length,
                lambda m, v: m._set_constrained("raw_period_length", v),
            )

    @property
    def period_length(self):
        return self._constrained("raw_period_length")

    @period_length.setter
    def period_length(self, value):
        self._set_constrained("raw_period_length", value)

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        x1_ = x1 / self.period_length
        x2_ = x2 / self.period_length
        if last_dim_is_batch:
            x1b = jnp.swapaxes(x1_, -1, -2)  # (..., d, n)
            x2b = jnp.swapaxes(x2_, -1, -2)
            diff = x1b - x2b if diag else x1b[..., :, None] - x2b[..., None, :]  # (..., d, n[, m])
            sin2 = jnp.sin(math.pi * diff) ** 2
            ls_d = jnp.swapaxes(self.lengthscale, -1, -2)  # (..., d, 1)
            if not diag:
                ls_d = ls_d[..., None]
            return jnp.exp(-2.0 * sin2 / (ls_d**2))
        if diag:
            diff = x1_ - x2_  # (..., n, d)
            sin2 = jnp.sin(math.pi * diff) ** 2
            val = jnp.sum(sin2 / (self.lengthscale[..., 0, :] ** 2)[..., None, :], axis=-1)
            return jnp.exp(-2.0 * val)
        diff = x1_[..., :, None, :] - x2_[..., None, :, :]  # (..., n, m, d)
        sin2 = jnp.sin(math.pi * diff) ** 2
        inv_l2 = 1.0 / (self.lengthscale**2)  # (..., 1, d)
        val = jnp.einsum("...nmd,...ud->...nm", sin2, inv_l2)
        return jnp.exp(-2.0 * val)


class CosineKernel(Kernel):
    """k(x,x') = cos(2π ‖x−x'‖ / p) (reference: gpytorch/kernels/cosine_kernel.py:14)."""

    has_lengthscale = False

    def __init__(self, period_length_prior=None, period_length_constraint=None, **kwargs):
        super().__init__(**kwargs)
        self.register_parameter("raw_period_length", jnp.zeros(self.batch_shape + (1, 1), dtype=self._param_dtype))
        self.register_constraint("raw_period_length", period_length_constraint or Positive())
        if period_length_prior is not None:
            self.register_prior(
                "period_length_prior",
                period_length_prior,
                lambda m: m.period_length,
                lambda m, v: m._set_constrained("raw_period_length", v),
            )

    @property
    def period_length(self):
        return self._constrained("raw_period_length")

    @period_length.setter
    def period_length(self, value):
        self._set_constrained("raw_period_length", value)

    @property
    def is_stationary(self):
        return True

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        x1_ = x1 / self.period_length
        x2_ = x2 / self.period_length
        x1_, x2_ = _maybe_last_dim_batch(x1_, x2_, last_dim_is_batch)
        r = self.covar_dist(x1_, x2_, diag=diag, square_dist=False)
        return jnp.cos(2.0 * math.pi * r)
