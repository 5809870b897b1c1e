"""Approximate (variational) MLL skeleton (reference: gpytorch/mlls/_approximate_mll.py:12):
ELBO-style objective = likelihood term − β·KL/num_data + added loss terms + priors."""

from __future__ import annotations

import jax.numpy as jnp

from .marginal_log_likelihood import MarginalLogLikelihood


class _ApproximateMarginalLogLikelihood(MarginalLogLikelihood):
    def __init__(self, likelihood, model, num_data: int, beta: float = 1.0, combine_terms: bool = True):
        super().__init__(likelihood, model)
        self.num_data = int(num_data)
        self.beta = float(beta)
        self.combine_terms = bool(combine_terms)

    def _log_likelihood_term(self, approximate_dist_f, target, **kwargs):
        raise NotImplementedError

    def forward(self, approximate_dist_f, target, **kwargs):
        # likelihood term, averaged per data point in the batch (reference :44-76)
        num_batch = approximate_dist_f.event_shape[0]
        # kl_indices: minibatched stochastic-KL estimator for NNVariationalStrategy
        # (reference VNNGP :339-465 — the KL over M inducing values is subsampled like
        # the data batch); only pass it for strategies that accept it
        kl_kwargs = {}
        if "kl_indices" in kwargs:
            kl_kwargs["kl_indices"] = kwargs.pop("kl_indices")
        log_likelihood = self._log_likelihood_term(approximate_dist_f, target, **kwargs) / num_batch
        kl_divergence = self.model.variational_strategy.kl_divergence(
            model=self.model, **kl_kwargs
        ) * (self.beta / self.num_data)

        # priors and added loss terms
        log_prior = self.model.prior_log_prob_sum()
        if log_prior is None:
            log_prior = jnp.zeros_like(kl_divergence)
        else:
            log_prior = log_prior / self.num_data
        added_loss = jnp.zeros_like(kl_divergence)
        had_added_loss = False
        for term in self.model.added_loss_terms():
            added_loss = added_loss + term.loss()
            had_added_loss = True

        if self.combine_terms:
            return log_likelihood - kl_divergence + log_prior - added_loss
        if had_added_loss:
            return log_likelihood, kl_divergence, log_prior, added_loss
        return log_likelihood, kl_divergence, log_prior
