"""Natural-parameter variational distributions (reference:
gpytorch/variational/natural_variational_distribution.py:21 and
tril_natural_variational_distribution.py:19).

Parameters are natural coordinates θ = (S⁻¹μ, −½S⁻¹).  A ``jax.custom_vjp`` on the
natural→(μ, Σ) conversion replaces the Euclidean gradient with the *expectation-parameter*
gradient (η = (μ, Σ+μμᵀ)):  ∂L/∂η1 = μ̄ − 2Σ̄μ, ∂L/∂η2 = Σ̄.  Plain SGD on θ with these
gradients IS natural gradient descent (pairs with optim.ngd; reference custom autograd
``_NaturalToMuVarSqrt``, natural_variational_distribution.py:96-143).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..distributions import MultivariateNormal
from ..linop import CholLinearOperator, DenseLinearOperator
from ..solvers.cholesky import psd_safe_cholesky
from ._variational_distribution import _VariationalDistribution


@jax.custom_vjp
def _natural_to_mu_sigma(nat_vec, nat_mat):
    """θ = (S⁻¹μ, −½S⁻¹) → (μ, Σ).  Backward delivers expectation-parameter gradients."""
    prec = -2.0 * _symmetrize(nat_mat)
    L_prec = psd_safe_cholesky(prec)
    eye = jnp.broadcast_to(jnp.eye(prec.shape[-1], dtype=prec.dtype), prec.shape)
    sigma = jax.scipy.linalg.cho_solve((L_prec, True), eye)
    sigma = _symmetrize(sigma)
    mu = (sigma @ nat_vec[..., None])[..., 0]
    return mu, sigma


def _symmetrize(A):
    return 0.5 * (A + jnp.swapaxes(A, -1, -2))


def _nat_fwd(nat_vec, nat_mat):
    mu, sigma = _natural_to_mu_sigma(nat_vec, nat_mat)
    return (mu, sigma), (mu,)


def _nat_bwd(res, cotangents):
    (mu,) = res
    mu_bar, sigma_bar = cotangents
    sigma_bar = _symmetrize(sigma_bar)
    # expectation-parameter gradients (this is the whole trick):
    deta1 = mu_bar - 2.0 * (sigma_bar @ mu[..., None])[..., 0]
    deta2 = sigma_bar
    return deta1, deta2


_natural_to_mu_sigma.defvjp(_nat_fwd, _nat_bwd)


class _NaturalVariationalDistribution(_VariationalDistribution):
    """Marker base for natural-coordinate variational distributions (reference:
    natural_variational_distribution.py:15).  NGD-style optimizers and downstream
    libraries use an isinstance check against this class to detect that the parameters
    are natural coordinates."""


class NaturalVariationalDistribution(_NaturalVariationalDistribution):
    """Reference: natural_variational_distribution.py:21."""

    def __init__(self, num_inducing_points: int, batch_shape=(), mean_init_std: float = 1e-3, dtype=jnp.float32):
        super().__init__(num_inducing_points, batch_shape, mean_init_std)
        m = self.num_inducing_points
        self.register_parameter("natural_vec", jnp.zeros(self.batch_shape + (m,), dtype=dtype))
        self.register_parameter(
            "natural_mat", jnp.broadcast_to(-0.5 * jnp.eye(m, dtype=dtype), self.batch_shape + (m, m))
        )

    def forward(self) -> MultivariateNormal:
        mu, sigma = _natural_to_mu_sigma(self.natural_vec, self.natural_mat)
        L = psd_safe_cholesky(sigma)
        return MultivariateNormal(mu, CholLinearOperator(L))

    def initialize_variational_distribution(self, prior_dist: MultivariateNormal, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        mean = prior_dist.mean
        noise = self.mean_init_std * jax.random.normal(key, mean.shape, dtype=mean.dtype)
        mean = mean + noise
        cov = prior_dist.lazy_covariance_matrix.evaluate_kernel().to_dense()
        L = psd_safe_cholesky(cov)
        eye = jnp.broadcast_to(jnp.eye(cov.shape[-1], dtype=cov.dtype), cov.shape)
        prec = jax.scipy.linalg.cho_solve((L, True), eye)
        nat_vec = (prec @ mean[..., None])[..., 0]
        nat_mat = -0.5 * prec
        self.natural_vec = jnp.broadcast_to(nat_vec, self.natural_vec.shape).astype(self.natural_vec.dtype)
        self.natural_mat = jnp.broadcast_to(nat_mat, self.natural_mat.shape).astype(self.natural_mat.dtype)


class TrilNaturalVariationalDistribution(_NaturalVariationalDistribution):
    """Precision parameterized by its Cholesky factor for stability (reference:
    tril_natural_variational_distribution.py:19).  The expectation-gradient surgery is applied
    at the (μ, Σ) level and chained through the tril parameterization."""

    def __init__(self, num_inducing_points: int, batch_shape=(), mean_init_std: float = 1e-3, dtype=jnp.float32):
        super().__init__(num_inducing_points, batch_shape, mean_init_std)
        m = self.num_inducing_points
        self.register_parameter("natural_vec", jnp.zeros(self.batch_shape + (m,), dtype=dtype))
        self.register_parameter(
            "natural_tril_mat", jnp.broadcast_to(jnp.eye(m, dtype=dtype), self.batch_shape + (m, m))
        )

    def forward(self) -> MultivariateNormal:
        W = jnp.tril(self.natural_tril_mat)  # precision = W Wᵀ
        nat_mat = -0.5 * W @ jnp.swapaxes(W, -1, -2)
        mu, sigma = _natural_to_mu_sigma(self.natural_vec, nat_mat)
        L = psd_safe_cholesky(sigma)
        return MultivariateNormal(mu, CholLinearOperator(L))

    def initialize_variational_distribution(self, prior_dist: MultivariateNormal, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        mean = prior_dist.mean
        noise = self.mean_init_std * jax.random.normal(key, mean.shape, dtype=mean.dtype)
        mean = mean + noise
        cov = prior_dist.lazy_covariance_matrix.evaluate_kernel().to_dense()
        L = psd_safe_cholesky(cov)
        eye = jnp.broadcast_to(jnp.eye(cov.shape[-1], dtype=cov.dtype), cov.shape)
        prec = jax.scipy.linalg.cho_solve((L, True), eye)
        W = psd_safe_cholesky(prec)
        nat_vec = (prec @ mean[..., None])[..., 0]
        self.natural_vec = jnp.broadcast_to(nat_vec, self.natural_vec.shape).astype(self.natural_vec.dtype)
        self.natural_tril_mat = jnp.broadcast_to(W, self.natural_tril_mat.shape).astype(self.natural_tril_mat.dtype)
