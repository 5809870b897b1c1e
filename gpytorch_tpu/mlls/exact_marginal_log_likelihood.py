"""Exact GP marginal log likelihood (reference:
gpytorch/mlls/exact_marginal_log_likelihood.py:13-89)."""

from __future__ import annotations

import jax.numpy as jnp

from .. import settings
from ..distributions import MultivariateNormal
from ..likelihoods.gaussian_likelihood import _GaussianLikelihoodBase
from .marginal_log_likelihood import MarginalLogLikelihood


class ExactMarginalLogLikelihood(MarginalLogLikelihood):
    def __init__(self, likelihood, model):
        from ..likelihoods.multitask_gaussian_likelihood import MultitaskGaussianLikelihood

        # reference: multitask Gaussian likelihoods subclass _GaussianLikelihoodBase
        # (gpytorch/likelihoods/multitask_gaussian_likelihood.py:162)
        if not isinstance(likelihood, (_GaussianLikelihoodBase, MultitaskGaussianLikelihood)):
            raise RuntimeError("Likelihood must be Gaussian for exact inference")
        super().__init__(likelihood, model)

    def _add_other_terms(self, res, params):
        # added loss terms (reference :41-47)
        for added_loss_term in self.model.added_loss_terms():
            res = res + added_loss_term.loss(*params)
        # scaled prior log probs (reference :48-52)
        prior_sum = self.model.prior_log_prob_sum()
        if prior_sum is not None:
            res = res + prior_sum
        lik_prior = self.likelihood.prior_log_prob_sum()
        if lik_prior is not None:
            res = res + lik_prior
        return res

    def forward(self, function_dist: MultivariateNormal, target, *params, key=None, solver_config=None,
                solver_state=None, return_state: bool = False, **kwargs):
        """Reference :54-89; ``observation_nan_policy`` ∈ {ignore, mask, fill} (:71-81).

        ``key`` seeds the SLQ probe vectors (fresh stochastic-trace probes each step); thread
        a per-step key through jitted training loops.  ``solver_config``: explicit
        ``settings.SolverConfig`` snapshot overriding ambient solver settings under jit.

        ``solver_state``/``return_state``: warm-started mBCG solves across optimizer steps
        (TPU-native extension; requires skip_logdet_forward + deterministic_probes — see
        solvers/inv_quad.py).  With ``return_state`` the call returns ``(mll, new_state)``;
        thread the state through the jitted training loop like optimizer state.
        """
        if not isinstance(function_dist, MultivariateNormal):
            raise RuntimeError("ExactMarginalLogLikelihood requires an MVN model output")
        nan_policy = settings.observation_nan_policy.value()
        output = self.likelihood(function_dist, *params, **kwargs)
        state = solver_state
        if return_state:
            if nan_policy != "ignore":
                raise ValueError("warm-started solves support observation_nan_policy='ignore' only")
            res, state = output.log_prob(target, key=key, solver_config=solver_config,
                                         solver_state=solver_state, return_state=True)
        elif nan_policy == "ignore":
            res = output.log_prob(target, key=key, solver_config=solver_config)
        elif nan_policy == "mask":
            from ..linop import MaskedLinearOperator

            mask = ~jnp.isnan(target)
            covar = MaskedLinearOperator(output.lazy_covariance_matrix.evaluate_kernel(), mask)
            masked_target = jnp.where(mask, target, output.mean)
            mvn = MultivariateNormal(jnp.where(mask, output.mean, masked_target), covar)
            res = mvn.log_prob(jnp.where(mask, target, output.mean), key=key, solver_config=solver_config)
            # correct the constant term: identity-padded dims each add ½log(2π)
            num_masked = jnp.sum(~mask, axis=-1)
            res = res + 0.5 * num_masked * jnp.log(2 * jnp.pi)
        elif nan_policy == "fill":
            mask = ~jnp.isnan(target)
            filled = jnp.where(mask, target, output.mean)
            res = output.log_prob(filled, key=key, solver_config=solver_config)
        else:
            raise ValueError(f"unknown observation_nan_policy {nan_policy!r}")
        res = self._add_other_terms(res, params)
        # num_data from the covariance's (global) size — equals the event-shape product for
        # single-device models, and the global N·t when rows are sharded over a mesh.
        num_data = function_dist.lazy_covariance_matrix.shape[-1]
        if return_state:
            return res / num_data, state
        return res / num_data
