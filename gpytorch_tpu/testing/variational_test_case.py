"""VariationalTestCase (reference: gpytorch/test/variational_test_case.py:16, 398 LoC):
the {strategy × distribution × MLL} training/eval/fantasy matrix for SVGP components,
including the {batch-inducing × batch-data × batch-model} combinations (:268-299).

The reference asserts internal call counts via mock contexts; the JAX analogue asserts the
functional contract instead: loss finite with the expected batch shape, gradients flow to
EVERY trainable parameter, eval posterior is a valid MVN of the expected shape, KL ≥ 0,
and the OVC fantasy leg (pseudo-points → ExactGP) round-trips with the right cache shapes
(reference test_fantasy_call :300-373)."""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import pytest

from .. import settings
from ..distributions import MultivariateNormal
from ..likelihoods import GaussianLikelihood
from ..mlls import PredictiveLogLikelihood, VariationalELBO
from .base_test_case import BaseTestCase


class VariationalTestCase(BaseTestCase):
    """Subclasses set ``strategy_cls`` / ``distribution_cls`` (or override the factories)."""

    strategy_cls = None
    distribution_cls = None
    num_inducing = 16
    mll_classes = (VariationalELBO, PredictiveLogLikelihood)
    #: base batch shape prepended to every matrix combination (reference batch_shape property)
    batch_shape = ()
    #: strategies without a fantasy (OVC) path skip the fantasy leg
    supports_fantasy = True
    #: strategies without free-form batch inducing points (grid/decoupled) skip the matrix
    supports_batch_matrix = True

    def create_strategy(self, model, inducing_points):
        return type(self).strategy_cls(
            model, inducing_points,
            type(self).distribution_cls(inducing_points.shape[-2]),
            learn_inducing_locations=True, jitter_val=1e-4,
        )

    def create_model(self):
        import gpytorch_tpu as gp
        from ..kernels import RBFKernel, ScaleKernel
        from ..means import ConstantMean
        from ..models import ApproximateGP

        case = self

        class _Model(ApproximateGP):
            def __init__(self):
                Z = jnp.linspace(0, 1, case.num_inducing)[:, None]
                strategy = case.create_strategy(self, Z)
                super().__init__(strategy)
                self.mean_module = ConstantMean()
                self.covar_module = ScaleKernel(RBFKernel())

            def forward(self, x):
                return MultivariateNormal(self.mean_module(x), self.covar_module(x))

        return _Model()

    def create_data(self, n=64):
        x = jnp.linspace(0, 1, n)
        y = jnp.sin(2 * jnp.pi * x) + 0.05 * self.randn(n)
        return x, y

    # -- reference-matrix factories (reference :17-52) ---------------------------------------
    def _make_model_and_likelihood(
        self,
        num_inducing=16,
        batch_shape=(),
        inducing_batch_shape=(),
        constant_mean=True,
    ):
        """2-d-input SVGP with batched inducing points / batched variational distribution
        (reference _make_model_and_likelihood)."""
        from ..kernels import RBFKernel, ScaleKernel
        from ..means import ConstantMean, ZeroMean
        from ..models import ApproximateGP

        case = self

        class _Model(ApproximateGP):
            def __init__(self):
                Z = jnp.broadcast_to(
                    self._z_base, tuple(inducing_batch_shape) + self._z_base.shape
                )
                dist = type(case).distribution_cls(num_inducing, batch_shape=tuple(batch_shape))
                strategy = type(case).strategy_cls(
                    self, Z, dist, learn_inducing_locations=True, jitter_val=1e-4
                )
                super().__init__(strategy)
                if constant_mean:
                    self.mean_module = ConstantMean()
                    self.mean_module.constant = 1.0
                else:
                    self.mean_module = ZeroMean()
                self.covar_module = ScaleKernel(RBFKernel())

            def forward(self, x):
                return MultivariateNormal(self.mean_module(x), self.covar_module(x))

        _Model._z_base = self.randn(num_inducing, 2)
        return _Model(), GaussianLikelihood()

    def _combined_params(self, model, lik):
        return {
            **{f"m.{k}": v for k, v in model.trainable_params().items()},
            **{f"l.{k}": v for k, v in lik.trainable_params().items()},
        }

    def _training_iter(self, model, likelihood, data_batch_shape=(), mll_cls=VariationalELBO):
        """One forward/backward; asserts every trainable parameter receives a nonzero
        gradient (reference _training_iter :54-89).  Returns (output, loss)."""
        n = 32
        train_x = jnp.clip(self.randn(*data_batch_shape, n, 2), -2.5, 2.5)
        train_y = jnp.linspace(-1, 1, n)
        _ = model(train_x)  # eager variational init
        params = self._combined_params(model, likelihood)

        def loss_fn(p):
            m = model.with_params({k[2:]: v for k, v in p.items() if k.startswith("m.")})
            l = likelihood.with_params({k[2:]: v for k, v in p.items() if k.startswith("l.")})
            mll = mll_cls(l, m, num_data=n)
            return jnp.sum(mll(m(train_x), train_y))

        loss_sum, grads = jax.value_and_grad(loss_fn)(params)
        assert bool(jnp.isfinite(loss_sum)), f"{mll_cls.__name__} loss not finite"
        for k, g in grads.items():
            assert bool(jnp.all(jnp.isfinite(g))), f"non-finite grad for {k}"
            assert float(jnp.linalg.norm(jnp.ravel(g))) > 0, f"zero gradient for {k}"
        # loss with the expected batch shape (reference asserts loss.shape)
        output = model(train_x)
        loss_val = mll_cls(likelihood, model, num_data=n)(output, train_y)
        return output, loss_val

    def _eval_iter(self, model, data_batch_shape=()):
        test_x = jnp.clip(self.randn(*data_batch_shape, 32, 2), -2.5, 2.5)
        model = model.eval()
        return model(test_x)

    def _run_matrix(
        self,
        data_batch_shape=None,
        inducing_batch_shape=None,
        model_batch_shape=None,
        eval_data_batch_shape=None,
        expected_batch_shape=None,
        train_expected_batch_shape=None,
        constant_mean=True,
    ):
        if not self.supports_batch_matrix:
            pytest.skip("strategy does not take free-form batched inducing points")
        base = tuple(self.batch_shape)
        model_batch_shape = base if model_batch_shape is None else model_batch_shape
        data_batch_shape = base if data_batch_shape is None else data_batch_shape
        inducing_batch_shape = base if inducing_batch_shape is None else inducing_batch_shape
        eval_data_batch_shape = data_batch_shape if eval_data_batch_shape is None else eval_data_batch_shape
        expected_batch_shape = base if expected_batch_shape is None else expected_batch_shape
        train_expected = (
            expected_batch_shape if train_expected_batch_shape is None else train_expected_batch_shape
        )

        model, lik = self._make_model_and_likelihood(
            batch_shape=model_batch_shape,
            inducing_batch_shape=inducing_batch_shape,
            constant_mean=constant_mean,
        )
        output, loss = self._training_iter(model, lik, data_batch_shape)
        assert output.batch_shape == tuple(train_expected), (output.batch_shape, train_expected)
        assert output.event_shape == (32,)
        assert jnp.shape(loss) == tuple(train_expected), (jnp.shape(loss), train_expected)
        out = self._eval_iter(model, eval_data_batch_shape)
        assert out.batch_shape == tuple(expected_batch_shape), (
            out.batch_shape, expected_batch_shape
        )
        assert bool(jnp.all(jnp.isfinite(out.mean)))
        assert bool(jnp.all(out.variance >= -1e-5))
        return model, lik

    # -- the {batch inducing × batch data × batch model} matrix (reference :268-299) ---------
    def test_training_iteration(self):
        self._run_matrix()

    def test_training_iteration_batch_inducing(self):
        self._run_matrix(
            model_batch_shape=(3,) + tuple(self.batch_shape),
            inducing_batch_shape=(3,) + tuple(self.batch_shape),
            expected_batch_shape=(3,) + tuple(self.batch_shape),
        )

    def test_training_iteration_batch_data(self):
        self._run_matrix(
            data_batch_shape=(3,) + tuple(self.batch_shape),
            expected_batch_shape=(3,) + tuple(self.batch_shape),
        )

    def test_training_iteration_batch_model(self):
        self._run_matrix(
            model_batch_shape=(3,) + tuple(self.batch_shape),
            expected_batch_shape=(3,) + tuple(self.batch_shape),
        )

    def test_training_all_batch_zero_mean(self):
        self._run_matrix(
            model_batch_shape=(3, 4) + tuple(self.batch_shape),
            inducing_batch_shape=(3, 1) + tuple(self.batch_shape),
            data_batch_shape=(4,) + tuple(self.batch_shape),
            expected_batch_shape=(3, 4) + tuple(self.batch_shape),
            constant_mean=False,
        )

    def test_eval_smaller_pred_batch(self):
        self._run_matrix(
            model_batch_shape=(3, 4) + tuple(self.batch_shape),
            inducing_batch_shape=(3, 1) + tuple(self.batch_shape),
            data_batch_shape=(3, 4) + tuple(self.batch_shape),
            eval_data_batch_shape=(4,) + tuple(self.batch_shape),
            expected_batch_shape=(3, 4) + tuple(self.batch_shape),
        )

    def test_eval_larger_pred_batch(self):
        self._run_matrix(
            model_batch_shape=(4,) + tuple(self.batch_shape),
            inducing_batch_shape=tuple(self.batch_shape),
            data_batch_shape=(4,) + tuple(self.batch_shape),
            eval_data_batch_shape=(3, 4) + tuple(self.batch_shape),
            expected_batch_shape=(3, 4) + tuple(self.batch_shape),
            train_expected_batch_shape=(4,) + tuple(self.batch_shape),
        )

    # -- fantasy / online-update leg (reference test_fantasy_call :300-373) -------------------
    def test_fantasy_call(self):
        if not self.supports_batch_matrix:
            pytest.skip("strategy does not take free-form batched inducing points")
        if not self.supports_fantasy:
            pytest.skip("strategy has no pseudo-point fantasy path")
        from ..kernels import MaternKernel
        from ..means import ZeroMean
        from ..models import ExactGP

        num_fant = 10
        model, lik = self._make_model_and_likelihood()
        _ = model(jnp.clip(self.randn(32, 2), -2.5, 2.5))  # variational init
        val_x = jnp.clip(self.randn(num_fant, 2), -2.5, 2.5)
        val_y = jnp.linspace(-1, 1, num_fant)

        from ..variational import CholeskyVariationalDistribution

        if type(self).distribution_cls is not CholeskyVariationalDistribution:
            # reference parity: fantasy/OVC models exist only for Cholesky variational
            # distributions (reference _variational_strategy.py:273-281; the reference
            # test asserts the raise, test_variational_strategy.py:43-49)
            model.likelihood = lik
            with pytest.raises(NotImplementedError):
                model.get_fantasy_model(val_x, val_y)
            return

        for covar_module, mean_module in (
            (None, None),
            (MaternKernel(), ZeroMean()),
        ):
            model.likelihood = lik
            fant = model.get_fantasy_model(
                val_x, val_y, covar_module=covar_module, mean_module=mean_module
            )
            assert isinstance(fant, ExactGP), type(fant)
            if covar_module is None:
                assert type(fant.covar_module) is type(model.covar_module)
            else:
                assert type(fant.covar_module) is not type(model.covar_module)
            if mean_module is None:
                assert type(fant.mean_module) is type(model.mean_module)
            else:
                assert type(fant.mean_module) is not type(model.mean_module)
            # posterior over the fantasy points is a valid MVN conditioned on m + num_fant
            fant = fant.eval()
            out = fant(val_x)
            assert bool(jnp.all(jnp.isfinite(out.mean)))
            assert bool(jnp.all(out.variance >= -1e-5))
            assert fant.train_targets.shape[-1] == self.num_inducing + num_fant

    # -- functional contract (unbatched; kept from the r1 harness) ---------------------------
    def test_elbo_finite_and_grads_flow(self):
        x, y = self.create_data()
        for mll_cls in self.mll_classes:
            model = self.create_model()
            lik = GaussianLikelihood()
            _ = model(x[:4])  # eager variational init
            params = self._combined_params(model, lik)

            def loss_fn(p):
                m = model.with_params({k[2:]: v for k, v in p.items() if k.startswith("m.")})
                l = lik.with_params({k[2:]: v for k, v in p.items() if k.startswith("l.")})
                return -jnp.sum(mll_cls(l, m, num_data=y.shape[0])(m(x), y))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            assert bool(jnp.isfinite(loss)), f"{mll_cls.__name__} loss not finite"
            variational_grads = [v for k, v in grads.items() if "variational" in k]
            hyper_grads = [v for k, v in grads.items() if "covar_module" in k]
            assert variational_grads and any(
                float(jnp.max(jnp.abs(g))) > 0 for g in variational_grads
            ), "no gradient to variational parameters"
            assert hyper_grads and any(
                float(jnp.max(jnp.abs(g))) > 0 for g in hyper_grads
            ), "no gradient to kernel hyperparameters"

    def test_eval_posterior_valid(self):
        x, y = self.create_data()
        model = self.create_model()
        _ = model(x[:4])
        model.eval()
        test_x = jnp.linspace(0.05, 0.95, 11)
        out = model(test_x)
        assert isinstance(out, MultivariateNormal)
        assert bool(jnp.all(jnp.isfinite(out.mean)))
        assert bool(jnp.all(out.variance >= -1e-5))

    # -- call-count cache contract (reference variational_test_case.py:268-299 asserts
    # cholesky/CG invocation counts via mock contexts) ----------------------------------------
    #: exact psd_safe_cholesky count for ONE ELBO evaluation, when the strategy pins it
    #: (whitened strategies factor K_ZZ exactly once); None = assert boundedness only
    expected_cholesky_per_elbo = None

    def test_elbo_call_count_contract(self):
        """One ELBO evaluation has a FIXED linalg-call budget: identical repeat calls cost
        identical counts (a regression that rebuilds a cache per call fails the equality),
        and the per-call Cholesky count is the strategy's documented budget (or ≤ 4 when
        unpinned — a loop that re-factors K_ZZ per data point blows far past that)."""
        x, y = self.create_data()
        model = self.create_model()
        lik = GaussianLikelihood()
        _ = model(x[:4])  # eager variational init (outside the counted region)
        mll = VariationalELBO(lik, model, num_data=y.shape[0])
        with settings.count_linalg_calls() as c1:
            _ = mll(model(x), y)
        with settings.count_linalg_calls() as c2:
            _ = mll(model(x), y)
        assert dict(c1) == dict(c2), (dict(c1), dict(c2))
        n_chol = c1.get("psd_safe_cholesky", 0)
        if self.expected_cholesky_per_elbo is not None:
            assert n_chol == self.expected_cholesky_per_elbo, (n_chol, dict(c1))
        else:
            # natural-parameterization distributions legitimately factor up to 5× per
            # ELBO (θ → (μ, L) conversions on top of the K_ZZ factor); anything past 6
            # means a per-data-point refactor loop
            assert n_chol <= 6, (n_chol, dict(c1))

    def test_kl_nonnegative(self):
        x, _ = self.create_data()
        model = self.create_model()
        _ = model(x[:4])
        kl = model.variational_strategy.kl_divergence(model=model)
        assert bool(jnp.all(jnp.isfinite(kl)))
        assert float(jnp.min(jnp.atleast_1d(kl))) > -1e-4
