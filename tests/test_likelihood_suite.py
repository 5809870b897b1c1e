"""Apply the shipped BaseLikelihoodTestCase harness across the likelihood inventory
(reference pattern: the 12 files in test/likelihoods/ subclass
gpytorch/test/base_likelihood_test_case.py)."""

import jax.numpy as jnp
import pytest

import gpytorch_tpu.likelihoods as L
from gpytorch_tpu.testing import BaseLikelihoodTestCase


class TestGaussianLikelihood(BaseLikelihoodTestCase):
    def create_likelihood(self, **kwargs):
        return L.GaussianLikelihood(**kwargs)


class TestGaussianLikelihoodWithMissingObs(BaseLikelihoodTestCase):
    def create_likelihood(self, **kwargs):
        return L.GaussianLikelihoodWithMissingObs(**kwargs)


class TestBernoulliLikelihood(BaseLikelihoodTestCase):
    def create_likelihood(self, **kwargs):
        return L.BernoulliLikelihood(**kwargs)

    def _create_targets(self, batch_shape=()):
        return (self.randn(*batch_shape, self.event_size) > 0).astype(jnp.float64)


class TestBetaLikelihood(BaseLikelihoodTestCase):
    def create_likelihood(self, **kwargs):
        return L.BetaLikelihood(**kwargs)

    def _create_targets(self, batch_shape=()):
        import jax

        return jax.nn.sigmoid(self.randn(*batch_shape, self.event_size)) * 0.96 + 0.02


class TestLaplaceLikelihood(BaseLikelihoodTestCase):
    def create_likelihood(self, **kwargs):
        return L.LaplaceLikelihood(**kwargs)


class TestStudentTLikelihood(BaseLikelihoodTestCase):
    def create_likelihood(self, **kwargs):
        return L.StudentTLikelihood(**kwargs)


class TestPoissonLikelihood(BaseLikelihoodTestCase):
    def create_likelihood(self, **kwargs):
        return L.PoissonLikelihood(**kwargs)

    def _create_targets(self, batch_shape=()):
        return jnp.abs(jnp.round(self.randn(*batch_shape, self.event_size) * 2.0)) + 0.0


class TestNegativeBinomialLikelihood(BaseLikelihoodTestCase):
    def create_likelihood(self, **kwargs):
        return L.NegativeBinomialLikelihood(**kwargs)

    def _create_targets(self, batch_shape=()):
        return jnp.abs(jnp.round(self.randn(*batch_shape, self.event_size) * 2.0)) + 0.0


class TestFixedNoiseGaussianLikelihood(BaseLikelihoodTestCase):
    def create_likelihood(self, **kwargs):
        return L.FixedNoiseGaussianLikelihood(noise=0.1 * jnp.ones(self.event_size), **kwargs)

    def test_batch(self):
        pytest.skip("fixed noise is sized for unbatched inputs")

    def test_multi_batch(self):
        pytest.skip("fixed noise is sized for unbatched inputs")
