"""Likelihood base classes (reference: gpytorch/likelihoods/likelihood.py:22-421).

``__call__`` dispatch: array input → conditional p(y|f); MultivariateNormal input → marginal
p(y|x) (reference :72-84).  Non-Gaussian likelihoods compute ``expected_log_prob`` /
``log_marginal`` by Gauss-Hermite quadrature (``_OneDimensionalLikelihood``, reference :399)
or Monte Carlo (``_draw_likelihood_samples``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from .. import settings
from ..core.module import Module
from ..distributions import Distribution, MultivariateNormal, Normal
from ..utils.quadrature import GaussHermiteQuadrature1D


class Likelihood(Module):
    """p(y | f).  Subclasses implement ``forward(function_samples) -> Distribution``."""

    def __init__(self):
        super().__init__()
        self.max_plate_nesting = 1

    def forward(self, function_samples: jax.Array, *args, **kwargs) -> Distribution:
        raise NotImplementedError

    def _draw_likelihood_samples(self, function_dist: MultivariateNormal, *args, key=None, **kwargs):
        num_samples = settings.num_likelihood_samples.value()
        if key is None:
            key = jax.random.PRNGKey(0)
        samples = function_dist.rsample(key, (num_samples,))
        return self.forward(samples, *args, **kwargs)

    def expected_log_prob(self, observations, function_dist: MultivariateNormal, *args, key=None, **kwargs):
        """E_{f ~ q(f)}[log p(y|f)] — MC fallback (reference likelihood.py expected_log_prob)."""
        dist = self._draw_likelihood_samples(function_dist, *args, key=key, **kwargs)
        lp = dist.log_prob(observations)
        return jnp.mean(lp, axis=0)

    def log_marginal(self, observations, function_dist: MultivariateNormal, *args, key=None, **kwargs):
        """log E_{f}[p(y|f)] (reference likelihood.py log_marginal)."""
        dist = self._draw_likelihood_samples(function_dist, *args, key=key, **kwargs)
        lp = dist.log_prob(observations)
        num = lp.shape[0]
        return jax.scipy.special.logsumexp(lp, axis=0) - jnp.log(jnp.asarray(num, lp.dtype))

    def marginal(self, function_dist: MultivariateNormal, *args, key=None, **kwargs):
        """p(y|x) = ∫ p(y|f) q(f) df, as a sampled mixture (reference likelihood.py marginal)."""
        return self._draw_likelihood_samples(function_dist, *args, key=key, **kwargs)

    def __call__(self, input: Any, *args, **kwargs):
        if isinstance(input, MultivariateNormal):
            return self.marginal(input, *args, **kwargs)
        if isinstance(input, jax.Array) or hasattr(input, "__jax_array__") or hasattr(input, "shape"):
            return self.forward(jnp.asarray(input), *args, **kwargs)
        raise RuntimeError("Likelihood expects an array of function values or a MultivariateNormal")


# torch-parity alias used across the reference
_Likelihood = Likelihood


class _OneDimensionalLikelihood(Likelihood):
    """Likelihoods of scalar functions: quadrature-based expectations (reference :399-421)."""

    def __init__(self):
        super().__init__()
        self.quadrature = GaussHermiteQuadrature1D()

    def expected_log_prob(self, observations, function_dist: MultivariateNormal, *args, **kwargs):
        log_prob_lambda = lambda f: self.forward(f, *args, **kwargs).log_prob(observations)
        return self.quadrature(log_prob_lambda, function_dist)

    def log_marginal(self, observations, function_dist: MultivariateNormal, *args, **kwargs):
        prob_lambda = lambda f: jnp.exp(self.forward(f, *args, **kwargs).log_prob(observations))
        prob = self.quadrature(prob_lambda, function_dist)
        return jnp.log(jnp.maximum(prob, 1e-30))


class LikelihoodList(Module):
    """Reference: gpytorch/likelihoods/likelihood_list.py:16."""

    def __init__(self, *likelihoods):
        super().__init__()
        self.likelihoods = list(likelihoods)

    def forward(self, *args, **kwargs):
        if len(args) == 1 and isinstance(args[0], (list, tuple)):
            args = args[0]
        return [lik(a) for lik, a in zip(self.likelihoods, args)]

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)
