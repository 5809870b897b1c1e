"""The shipped BaseModelTestCase / VariationalModelTestCase harness applied to the model
families (reference: gpytorch/test/model_test_case.py consumed by test/models/):
exact GP (dense + KISS + SGPR kernels) and approximate GP (whitened SVGP)."""

import jax
import jax.numpy as jnp

from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import (
    GridInterpolationKernel,
    InducingPointKernel,
    RBFKernel,
    ScaleKernel,
)
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood, VariationalELBO
from gpytorch_tpu.models import ApproximateGP, ExactGP
from gpytorch_tpu.testing import BaseModelTestCase, VariationalModelTestCase
from gpytorch_tpu.variational import CholeskyVariationalDistribution, VariationalStrategy


class _ExactModelMixin:
    def create_test_data(self, batch_shape=()):
        return self.rand(*batch_shape, 32, 1)

    def create_likelihood_and_labels(self, batch_shape=()):
        y = jnp.sin(2 * jnp.pi * self.rand(*batch_shape, 32))
        return GaussianLikelihood(), y

    def compute_mll(self, model, likelihood, x, y):
        return ExactMarginalLogLikelihood(likelihood, model)(model(x), y)


class TestExactGPModel(_ExactModelMixin, BaseModelTestCase):
    def create_model(self, train_x, train_y, likelihood):
        class M(ExactGP):
            def __init__(self):
                super().__init__(train_x, train_y, likelihood)
                self.mean_module = ConstantMean()
                self.covar_module = ScaleKernel(RBFKernel())

            def forward(self, x):
                return MultivariateNormal(self.mean_module(x), self.covar_module(x))

        return M()


class TestExactGPKissModel(_ExactModelMixin, BaseModelTestCase):
    def create_model(self, train_x, train_y, likelihood):
        class M(ExactGP):
            def __init__(self):
                super().__init__(train_x, train_y, likelihood)
                self.mean_module = ConstantMean()
                self.covar_module = GridInterpolationKernel(
                    ScaleKernel(RBFKernel()), grid_size=16, num_dims=1,
                    grid_bounds=[(-0.1, 1.1)],
                )

            def forward(self, x):
                return MultivariateNormal(self.mean_module(x), self.covar_module(x))

        return M()

    def test_batch_forward_train(self):
        pass  # SKI interpolation is 2-D-input only, matching the reference's skip


class TestExactGPSgprModel(_ExactModelMixin, BaseModelTestCase):
    def create_model(self, train_x, train_y, likelihood):
        flat_x = train_x.reshape(-1, train_x.shape[-1])

        class M(ExactGP):
            def __init__(self):
                super().__init__(train_x, train_y, likelihood)
                self.mean_module = ConstantMean()
                self.covar_module = InducingPointKernel(
                    ScaleKernel(RBFKernel()), inducing_points=flat_x[:8], likelihood=likelihood
                )

            def forward(self, x):
                return MultivariateNormal(self.mean_module(x), self.covar_module(x))

        return M()


class TestSVGPModel(VariationalModelTestCase):
    def create_test_data(self, batch_shape=()):
        return self.rand(*batch_shape, 32, 1)

    def create_likelihood_and_labels(self, batch_shape=()):
        y = jnp.sin(2 * jnp.pi * self.rand(*batch_shape, 32))
        return GaussianLikelihood(), y

    def compute_mll(self, model, likelihood, x, y):
        return VariationalELBO(likelihood, model, num_data=y.shape[-1])(model(x), y)

    def create_model(self, train_x, train_y, likelihood):
        class M(ApproximateGP):
            def __init__(self):
                Z = jnp.linspace(0, 1, 12)[:, None]
                strategy = VariationalStrategy(
                    self, Z, CholeskyVariationalDistribution(12),
                    learn_inducing_locations=True, jitter_val=1e-4,
                )
                super().__init__(strategy)
                self.mean_module = ConstantMean()
                self.covar_module = ScaleKernel(RBFKernel())
                self.likelihood = likelihood

            def forward(self, x):
                return MultivariateNormal(self.mean_module(x), self.covar_module(x))

        m = M()
        _ = m(train_x[..., :4, :])  # eager variational init
        return m
