"""Added loss terms (reference: gpytorch/mlls/added_loss_term.py:10,
inducing_point_kernel_added_loss_term.py:12, kl_gaussian_added_loss_term.py:11,
noise_model_added_loss_term.py:8)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.module import Module


class AddedLossTerm:
    def loss(self, *params):
        raise NotImplementedError


class InducingPointKernelAddedLossTerm(AddedLossTerm):
    """SGPR variance-correction term −½ Σᵢ (k_ii − q_ii)/σ² (reference :12)."""

    def __init__(self, prior_dist, variational_dist, likelihood):
        self.prior_dist = prior_dist
        self.variational_dist = variational_dist
        self.likelihood = likelihood

    def loss(self, *params):
        prior_covar_diag = self.prior_dist.variance
        variational_covar_diag = self.variational_dist.variance
        noise_diag = self.likelihood._shaped_noise_covar(prior_covar_diag.shape, *params)._diagonal()
        noise_diag = jnp.broadcast_to(noise_diag, prior_covar_diag.shape)
        return -0.5 * jnp.sum((prior_covar_diag - variational_covar_diag) / noise_diag, axis=-1)


class KLGaussianAddedLossTerm(AddedLossTerm):
    """KL(q(x) ‖ p(x)) for GPLVM latent variables (reference :11)."""

    def __init__(self, q_x, p_x, n: int, data_dim: int):
        self.q_x = q_x
        self.p_x = p_x
        self.n = n
        self.data_dim = data_dim

    def loss(self, *params):
        # elementwise KL between diagonal Gaussians, summed over latent dims, averaged over n
        q, p = self.q_x, self.p_x
        var_q = q.variance
        var_p = p.variance
        kl = 0.5 * (jnp.log(var_p / var_q) + (var_q + (q.mean - p.mean) ** 2) / var_p - 1.0)
        kl_per_point = jnp.sum(kl, axis=-1) if kl.ndim > 1 else kl
        return jnp.sum(kl_per_point) * (self.data_dim / (self.n * max(self.data_dim, 1)))


class NoiseModelAddedLossTerm(AddedLossTerm):
    """MLL of the heteroskedastic noise model (reference :8)."""

    def __init__(self, noise_model, noise_mll):
        self.noise_model = noise_model
        self.noise_mll = noise_mll

    def loss(self, *params):
        output = self.noise_model(*params[:-1]) if len(params) > 1 else self.noise_model(*params)
        targets = params[-1]
        return jnp.sum(self.noise_mll(output, targets))
