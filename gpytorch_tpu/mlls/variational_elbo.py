"""VariationalELBO (reference: gpytorch/mlls/variational_elbo.py:8) and
GammaRobustVariationalELBO (reference: gpytorch/mlls/gamma_robust_variational_elbo.py:14)."""

from __future__ import annotations

import jax.numpy as jnp

from ._approximate_mll import _ApproximateMarginalLogLikelihood


class VariationalELBO(_ApproximateMarginalLogLikelihood):
    """SVGP ELBO: E_q[log p(y|f)] − β KL (uses ``likelihood.expected_log_prob``)."""

    def _log_likelihood_term(self, variational_dist_f, target, **kwargs):
        lp = self.likelihood.expected_log_prob(target, variational_dist_f, **kwargs)
        n_event = max(len(variational_dist_f.event_shape), 1)
        return jnp.sum(lp, axis=tuple(range(-n_event, 0)))


class GammaRobustVariationalELBO(_ApproximateMarginalLogLikelihood):
    """β-divergence robust ELBO (reference :14); closed form for Gaussian likelihoods."""

    def __init__(self, likelihood, model, gamma: float = 1.03, **kwargs):
        if gamma <= 1.0:
            raise ValueError("gamma should be > 1.0")
        super().__init__(likelihood, model, **kwargs)
        self.gamma = float(gamma)

    def _log_likelihood_term(self, variational_dist_f, target, **kwargs):
        import math

        gamma = self.gamma
        shifted_gamma = gamma - 1.0
        muf = variational_dist_f.mean
        varf = variational_dist_f.variance
        noise = self.likelihood._shaped_noise_covar(muf.shape, **kwargs)._diagonal()
        noise = jnp.broadcast_to(noise, muf.shape)
        # E_q[p(y|f)^{γ−1}] of a Gaussian — closed form (mirrors the reference's derivation)
        mut = shifted_gamma * target / noise + muf / varf
        sigmat = 1.0 / (shifted_gamma / noise + 1.0 / varf)
        log_integral = -0.5 * shifted_gamma * jnp.log(2 * math.pi * noise) - 0.5 * jnp.log1p(
            shifted_gamma * varf / noise
        )
        log_tempered = (
            -jnp.log(shifted_gamma)
            - 0.5 * shifted_gamma * jnp.log(2 * math.pi * noise)
            - 0.5 * jnp.log1p(shifted_gamma * varf / noise)
            - 0.5 * (shifted_gamma * target**2 / noise)
            - 0.5 * (muf**2 / varf)
            + 0.5 * (mut**2 * sigmat)
        )
        factor = gamma / shifted_gamma
        return jnp.sum(jnp.exp(log_tempered) * factor, axis=-1)
