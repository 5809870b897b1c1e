"""The shipped VariationalTestCase harness applied across the {strategy × distribution}
matrix (reference: gpytorch/test/variational_test_case.py:16 consumed by the 11 files in
test/variational/).  Long-tail strategies with bespoke constructors override
``create_strategy``; accuracy-gated end-to-end training lives in
test_variational_long_tail.py / test_svgp_regression.py — this file is the contract
matrix (ELBO finite, grads to variational AND hyper params, valid eval posterior, KL ≥ 0)."""

import jax.numpy as jnp

from gpytorch_tpu.testing import VariationalTestCase
from gpytorch_tpu.variational import (
    BatchDecoupledVariationalStrategy,
    CholeskyVariationalDistribution,
    CiqVariationalStrategy,
    DeltaVariationalDistribution,
    GridInterpolationVariationalStrategy,
    LargeBatchVariationalStrategy,
    MeanFieldVariationalDistribution,
    NaturalVariationalDistribution,
    OrthogonallyDecoupledVariationalStrategy,
    TrilNaturalVariationalDistribution,
    UnwhitenedVariationalStrategy,
    VariationalStrategy,
)


class TestWhitenedCholesky(VariationalTestCase):
    strategy_cls = VariationalStrategy
    distribution_cls = CholeskyVariationalDistribution


class TestWhitenedMeanField(VariationalTestCase):
    strategy_cls = VariationalStrategy
    distribution_cls = MeanFieldVariationalDistribution


class TestWhitenedDelta(VariationalTestCase):
    strategy_cls = VariationalStrategy
    distribution_cls = DeltaVariationalDistribution


class TestWhitenedNatural(VariationalTestCase):
    strategy_cls = VariationalStrategy
    distribution_cls = NaturalVariationalDistribution


class TestWhitenedTrilNatural(VariationalTestCase):
    strategy_cls = VariationalStrategy
    distribution_cls = TrilNaturalVariationalDistribution


class TestUnwhitenedCholesky(VariationalTestCase):
    strategy_cls = UnwhitenedVariationalStrategy
    distribution_cls = CholeskyVariationalDistribution


class TestLargeBatchCholesky(VariationalTestCase):
    strategy_cls = LargeBatchVariationalStrategy
    distribution_cls = CholeskyVariationalDistribution


class TestCiqCholesky(VariationalTestCase):
    strategy_cls = CiqVariationalStrategy
    distribution_cls = CholeskyVariationalDistribution


class TestBatchDecoupledCholesky(VariationalTestCase):
    strategy_cls = BatchDecoupledVariationalStrategy
    distribution_cls = CholeskyVariationalDistribution


class TestOrthogonallyDecoupledDelta(VariationalTestCase):
    """Delta mean strategy decoupled from a whitened Cholesky covar strategy
    (reference: orthogonally_decoupled_variational_strategy.py:16)."""

    distribution_cls = DeltaVariationalDistribution

    def create_strategy(self, model, inducing_points):
        covar_strategy = VariationalStrategy(
            model, inducing_points[: inducing_points.shape[0] // 2],
            CholeskyVariationalDistribution(inducing_points.shape[0] // 2),
            learn_inducing_locations=True, jitter_val=1e-4,
        )
        return OrthogonallyDecoupledVariationalStrategy(
            covar_strategy, inducing_points,
            DeltaVariationalDistribution(inducing_points.shape[-2]), jitter_val=1e-4,
        )


class TestGridInterpolationCholesky(VariationalTestCase):
    distribution_cls = CholeskyVariationalDistribution

    def create_strategy(self, model, inducing_points):
        m = inducing_points.shape[0]
        return GridInterpolationVariationalStrategy(
            model, grid_size=m, grid_bounds=[(0.0, 1.0)],
            variational_distribution=CholeskyVariationalDistribution(m),
        )
