"""SumMarginalLogLikelihood for IndependentModelList
(reference: gpytorch/mlls/sum_marginal_log_likelihood.py:8)."""

from __future__ import annotations

import jax.numpy as jnp

from .exact_marginal_log_likelihood import ExactMarginalLogLikelihood
from .marginal_log_likelihood import MarginalLogLikelihood


class SumMarginalLogLikelihood(MarginalLogLikelihood):
    def __init__(self, likelihood, model, mll_cls=ExactMarginalLogLikelihood):
        super().__init__(likelihood, model)
        self.mlls = [mll_cls(m.likelihood, m) for m in model.models]

    def forward(self, outputs, targets, *params):
        """outputs: list of MVNs; targets: list of arrays."""
        if len(params) == 0:
            sum_mll = None
            for mll, output, target in zip(self.mlls, outputs, targets):
                val = mll(output, target)
                sum_mll = val if sum_mll is None else sum_mll + val
        else:
            sum_mll = None
            for mll, output, target, *p in zip(self.mlls, outputs, targets, *params):
                val = mll(output, target, *p)
                sum_mll = val if sum_mll is None else sum_mll + val
        return sum_mll
