"""Wishart / InverseWishart priors (reference: gpytorch/priors/wishart_prior.py:15,67)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import multigammaln

from .prior import Prior


class WishartPrior(Prior):
    """W(nu, K): p(X) ∝ |X|^{(nu-p-1)/2} exp(-tr(K⁻¹X)/2)."""

    def __init__(self, nu, K):
        super().__init__()
        K = jnp.asarray(K, dtype=jnp.result_type(float))
        self.register_buffer("nu", jnp.asarray(nu, dtype=K.dtype))
        self.register_buffer("K_inv", jnp.linalg.inv(K))
        p = K.shape[-1]
        _, logdetK = jnp.linalg.slogdet(K)
        self.register_buffer(
            "C",
            -(self.nu / 2) * (logdetK + p * math.log(2.0)) - multigammaln(self.nu / 2, p),
        )
        self.p = p

    def log_prob(self, X):
        p = self.p
        _, logdetX = jnp.linalg.slogdet(X)
        trace = jnp.trace(self.K_inv @ X, axis1=-2, axis2=-1)
        return self.C + 0.5 * ((self.nu - p - 1) * logdetX - trace)

    def sample(self, key, sample_shape=()):
        n = int(self.nu)
        A = jax.random.normal(key, tuple(sample_shape) + (self.p, max(n, self.p + 1)), dtype=self.K_inv.dtype)
        K = jnp.linalg.inv(self.K_inv)
        L = jnp.linalg.cholesky(K)
        B = L @ A
        return B @ jnp.swapaxes(B, -1, -2) / max(n, self.p + 1) * self.nu


class InverseWishartPrior(Prior):
    """IW(nu, K): p(X) ∝ |X|^{-(nu+p+1)/2} exp(-tr(K X⁻¹)/2)  (reference :67)."""

    def __init__(self, nu, K):
        super().__init__()
        K = jnp.asarray(K, dtype=jnp.result_type(float))
        self.register_buffer("nu", jnp.asarray(nu, dtype=K.dtype))
        self.register_buffer("K", K)
        p = K.shape[-1]
        _, logdetK = jnp.linalg.slogdet(K)
        self.register_buffer(
            "C",
            (self.nu / 2) * logdetK - (self.nu * p / 2) * math.log(2.0) - multigammaln(self.nu / 2, p),
        )
        self.p = p

    def log_prob(self, X):
        p = self.p
        _, logdetX = jnp.linalg.slogdet(X)
        Xinv = jnp.linalg.inv(X)
        trace = jnp.trace(self.K @ Xinv, axis1=-2, axis2=-1)
        return self.C - 0.5 * ((self.nu + p + 1) * logdetX + trace)

    def sample(self, key, sample_shape=()):
        W = WishartPrior(self.nu, jnp.linalg.inv(self.K)).sample(key, sample_shape)
        return jnp.linalg.inv(W)
