"""BaseLikelihoodTestCase (reference: gpytorch/test/base_likelihood_test_case.py):
conditional/marginal dispatch, shapes, and MC-default consistency of expected_log_prob /
log_marginal, over non-batch/batch/multi-batch inputs."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest

from .. import settings
from ..distributions import Distribution, MultivariateNormal
from ..likelihoods.likelihood import Likelihood
from .base_test_case import BaseTestCase


class BaseLikelihoodTestCase(BaseTestCase):
    def create_likelihood(self, **kwargs):
        raise NotImplementedError

    #: event size of the test marginal
    event_size = 5

    def _create_conditional_input(self, batch_shape=()):
        return self.randn(*batch_shape, self.event_size)

    def _create_marginal_input(self, batch_shape=()):
        n = self.event_size
        mat = self.randn(*batch_shape, n, n)
        covar = mat @ jnp.swapaxes(mat, -1, -2) + jnp.broadcast_to(jnp.eye(n, dtype=mat.dtype), batch_shape + (n, n))
        return MultivariateNormal(self.randn(*batch_shape, n), covar)

    def _create_targets(self, batch_shape=()):
        return self.randn(*batch_shape, self.event_size)

    # -- per-shape checks ---------------------------------------------------------------------
    def _test_conditional(self, batch_shape):
        likelihood = self.create_likelihood()
        inp = self._create_conditional_input(batch_shape)
        output = likelihood(inp)
        assert isinstance(output, Distribution)
        assert output.sample(self.key()).shape[-len(inp.shape):] == inp.shape

    def _test_marginal(self, batch_shape):
        likelihood = self.create_likelihood()
        inp = self._create_marginal_input(batch_shape)
        output = likelihood(inp)
        assert isinstance(output, Distribution)

    def _test_log_marginal(self, batch_shape):
        likelihood = self.create_likelihood()
        inp = self._create_marginal_input(batch_shape)
        target = self._create_targets(batch_shape)
        with settings.num_likelihood_samples(512):
            output = likelihood.log_marginal(target, inp)
        assert output.shape == batch_shape + (self.event_size,)
        with settings.num_likelihood_samples(512):
            default = Likelihood.log_marginal(likelihood, target, inp, key=jax.random.PRNGKey(0))
        self.assertAllClose(output, default, rtol=0.3, atol=0.3)

    def _test_expected_log_prob(self, batch_shape):
        likelihood = self.create_likelihood()
        inp = self._create_marginal_input(batch_shape)
        target = self._create_targets(batch_shape)
        with settings.num_likelihood_samples(512):
            output = likelihood.expected_log_prob(target, inp)
        assert output.shape == batch_shape + (self.event_size,)
        with settings.num_likelihood_samples(512):
            default = Likelihood.expected_log_prob(likelihood, target, inp, key=jax.random.PRNGKey(0))
        self.assertAllClose(output, default, rtol=0.3, atol=0.3)

    # -- the inherited matrix (reference :89-103) ----------------------------------------------
    def test_nonbatch(self):
        self._test_conditional(())
        self._test_marginal(())
        self._test_log_marginal(())
        self._test_expected_log_prob(())

    def test_batch(self):
        self._test_conditional((3,))
        self._test_marginal((3,))
        self._test_log_marginal((3,))
        self._test_expected_log_prob((3,))

    def test_multi_batch(self):
        self._test_conditional((2, 3))
        self._test_marginal((2, 3))
