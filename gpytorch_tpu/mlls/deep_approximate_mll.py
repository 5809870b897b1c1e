"""Deep-GP MLLs (reference: gpytorch/mlls/deep_approximate_mll.py:6 and
deep_predictive_log_likelihood.py:7)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .marginal_log_likelihood import MarginalLogLikelihood


class DeepApproximateMLL(MarginalLogLikelihood):
    """Wraps a base approximate MLL: averages the likelihood term over the sample dim and
    sums KL over all layers (reference :6 + deep_gp.py:29)."""

    def __init__(self, base_mll):
        if not base_mll.combine_terms:
            raise ValueError("The base marginal log likelihood object should combine terms.")
        super().__init__(base_mll.likelihood, base_mll.model)
        self.base_mll = base_mll

    def forward(self, approximate_dist_f, target, **kwargs):
        base = self.base_mll
        num_batch = approximate_dist_f.event_shape[0]
        ll = base._log_likelihood_term(approximate_dist_f, target, **kwargs) / num_batch
        # average over the sample dimension (dim 0)
        ll = jnp.mean(ll, axis=0) if ll.ndim > 0 else ll
        kl = self.model.deep_kl_divergence() * (base.beta / base.num_data)
        log_prior = self.model.prior_log_prob_sum()
        res = ll - kl
        if log_prior is not None:
            res = res + log_prior / base.num_data
        for term in self.model.added_loss_terms():
            res = res - term.loss()
        return res


class DeepPredictiveLogLikelihood(MarginalLogLikelihood):
    """DSPP loss: log Σ_q w_q p(y | f_q) via the learned quadrature weights
    (reference: deep_predictive_log_likelihood.py:7 — logsumexp over sites)."""

    def __init__(self, likelihood, model, num_data: int, beta: float = 1.0):
        super().__init__(likelihood, model)
        self.num_data = int(num_data)
        self.beta = float(beta)

    def forward(self, approximate_dist_f, target, **kwargs):
        # per-site log-likelihoods: (Q, ..., n)
        base_log_marginal = self.likelihood.log_marginal(target, approximate_dist_f, **kwargs)
        deep_log_marginal = self.model.quad_weights.reshape(
            (-1,) + (1,) * (base_log_marginal.ndim - 1)
        ) + base_log_marginal
        deep_log_prob = jax.scipy.special.logsumexp(deep_log_marginal, axis=0)
        num_batch = approximate_dist_f.event_shape[0]
        ll = jnp.sum(deep_log_prob, axis=-1) / num_batch
        kl = self.model.deep_kl_divergence() * (self.beta / self.num_data)
        return ll - kl
