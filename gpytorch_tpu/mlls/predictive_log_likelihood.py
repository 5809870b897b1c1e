"""PredictiveLogLikelihood — PPGPR (reference: gpytorch/mlls/predictive_log_likelihood.py:8)."""

from __future__ import annotations

import jax.numpy as jnp

from ._approximate_mll import _ApproximateMarginalLogLikelihood


class PredictiveLogLikelihood(_ApproximateMarginalLogLikelihood):
    """Uses log E_q[p(y|f)] instead of E_q[log p(y|f)] — better-calibrated predictive
    variances (Jankowiak et al. 2020)."""

    def _log_likelihood_term(self, variational_dist_f, target, **kwargs):
        lp = self.likelihood.log_marginal(target, variational_dist_f, **kwargs)
        n_event = max(len(variational_dist_f.event_shape), 1)
        return jnp.sum(lp, axis=tuple(range(-n_event, 0)))
