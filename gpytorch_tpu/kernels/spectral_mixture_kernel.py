"""SpectralMixtureKernel (reference: gpytorch/kernels/spectral_mixture_kernel.py:17):
k(τ) = Σ_q w_q Π_d exp(−2π²τ_d²v_{qd}) cos(2πτ_d μ_{qd}), with empirical-spectrum
initialization (``initialize_from_data``)."""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..constraints import GreaterThan, Positive
from .kernel import Kernel


class SpectralMixtureKernel(Kernel):
    has_lengthscale = False
    is_stationary = True

    def __init__(
        self,
        num_mixtures: Optional[int] = None,
        ard_num_dims: int = 1,
        batch_shape=(),
        mixture_scales_prior=None,
        mixture_scales_constraint=None,
        mixture_means_prior=None,
        mixture_means_constraint=None,
        mixture_weights_prior=None,
        mixture_weights_constraint=None,
        **kwargs,
    ):
        if num_mixtures is None:
            raise RuntimeError("num_mixtures is a required argument")
        super().__init__(ard_num_dims=ard_num_dims, batch_shape=batch_shape, **kwargs)
        self.num_mixtures = int(num_mixtures)
        d = ard_num_dims
        dt = self._param_dtype
        self.register_parameter("raw_mixture_weights", jnp.zeros(self.batch_shape + (num_mixtures,), dtype=dt))
        self.register_parameter("raw_mixture_means", jnp.zeros(self.batch_shape + (num_mixtures, 1, d), dtype=dt))
        self.register_parameter("raw_mixture_scales", jnp.zeros(self.batch_shape + (num_mixtures, 1, d), dtype=dt))
        self.register_constraint("raw_mixture_weights", mixture_weights_constraint or Positive())
        self.register_constraint("raw_mixture_means", mixture_means_constraint or GreaterThan(1e-6))
        self.register_constraint("raw_mixture_scales", mixture_scales_constraint or Positive())

    @property
    def mixture_weights(self):
        return self._constrained("raw_mixture_weights")

    @mixture_weights.setter
    def mixture_weights(self, value):
        self._set_constrained("raw_mixture_weights", value)

    @property
    def mixture_means(self):
        return self._constrained("raw_mixture_means")

    @mixture_means.setter
    def mixture_means(self, value):
        self._set_constrained("raw_mixture_means", value)

    @property
    def mixture_scales(self):
        return self._constrained("raw_mixture_scales")

    @mixture_scales.setter
    def mixture_scales(self, value):
        self._set_constrained("raw_mixture_scales", value)

    def initialize_from_data_empspect(self, train_x, train_y, key=None):
        """Initialize from the empirical spectrum (reference initialize_from_data_empspect)."""
        import numpy as np

        train_x = np.asarray(train_x)
        train_y = np.asarray(train_y)
        if train_x.ndim == 1:
            train_x = train_x[:, None]
        N = train_x.shape[-2]
        emp_spect = np.abs(np.fft.rfft(train_y, axis=-1)) ** 2 / N
        M = math.floor(N / 2)
        freq1 = np.arange(M + 1)
        freq2 = np.arange(0, M) if N % 2 == 0 else np.arange(0, M + 1)
        freqs = np.concatenate([freq1, freq2]) / N
        freqs = freqs[: emp_spect.shape[-1]]
        total = emp_spect.sum(-1, keepdims=True)
        spect_cdf = np.cumsum(emp_spect, axis=-1) / total
        rng = np.random.RandomState(0)
        a = rng.rand(self.num_mixtures, 1)
        idx = np.searchsorted(spect_cdf.reshape(-1), a.reshape(-1)).clip(0, len(freqs) - 1)
        means = freqs[idx].reshape(self.num_mixtures, 1, 1)
        self.mixture_means = jnp.asarray(np.broadcast_to(means, (self.num_mixtures, 1, train_x.shape[-1])))
        self.mixture_scales = jnp.broadcast_to(
            jnp.asarray(1.0 / np.abs(train_x.max(0) - train_x.min(0)))[None, None, :],
            self.raw_mixture_scales.shape,
        )
        self.mixture_weights = jnp.full(self.raw_mixture_weights.shape, float(train_y.std() / self.num_mixtures))
        return self

    def initialize_from_data(self, train_x, train_y, key=None):
        """Heuristic init from data statistics (reference initialize_from_data)."""
        import numpy as np

        train_x = np.asarray(train_x)
        if train_x.ndim == 1:
            train_x = train_x[:, None]
        train_x_sort = np.sort(train_x, axis=-2)
        max_dist = train_x_sort[..., -1, :] - train_x_sort[..., 0, :]
        dists = np.diff(train_x_sort, axis=-2)
        dists = np.where(dists == 0, np.nan, dists)
        min_dist = np.nanmin(np.abs(dists), axis=-2)
        min_dist = np.where(np.isnan(min_dist), 1.0, min_dist)

        rng = np.random.RandomState(0)
        d = train_x.shape[-1]
        means = rng.rand(self.num_mixtures, 1, d) / (2.0 * min_dist)
        scales = np.abs(rng.randn(self.num_mixtures, 1, d) / (max_dist + 1e-12))
        self.mixture_means = jnp.asarray(np.broadcast_to(means, np.shape(self.raw_mixture_means)))
        self.mixture_scales = jnp.asarray(np.broadcast_to(np.maximum(scales, 1e-6), np.shape(self.raw_mixture_scales)))
        y_std = float(np.asarray(train_y).std())
        self.mixture_weights = jnp.full(self.raw_mixture_weights.shape, y_std / self.num_mixtures)
        return self

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        if last_dim_is_batch:
            x1 = jnp.swapaxes(x1, -1, -2)[..., None]
            x2 = jnp.swapaxes(x2, -1, -2)[..., None]
        means = self.mixture_means  # (*b, q, 1, d)
        scales = self.mixture_scales
        weights = self.mixture_weights  # (*b, q)

        if diag:
            tau = x1 - x2  # (..., n, d)
            tau = tau[..., None, :, :]  # (..., 1, n, d)
            exp_term = jnp.exp(-2.0 * (math.pi**2) * (tau**2) * (scales**2))
            cos_term = jnp.cos(2.0 * math.pi * tau * means)
            comp = jnp.prod(exp_term * cos_term, axis=-1)  # (..., q, n)
            return jnp.einsum("...q,...qn->...n", weights, comp)

        tau = x1[..., :, None, :] - x2[..., None, :, :]  # (..., n, m, d)
        tau = tau[..., None, :, :, :]  # (..., 1, n, m, d)
        m_ = means[..., :, None, :, :]  # (*b, q, 1, 1, d)
        s_ = scales[..., :, None, :, :]
        exp_term = jnp.exp(-2.0 * (math.pi**2) * (tau**2) * (s_**2))
        cos_term = jnp.cos(2.0 * math.pi * tau * m_)
        comp = jnp.prod(exp_term * cos_term, axis=-1)  # (..., q, n, m)
        return jnp.einsum("...q,...qnm->...nm", weights, comp)
