"""VariationalTestCase (reference: gpytorch/test/variational_test_case.py:16, 398 LoC):
the {strategy × distribution × MLL} training/eval matrix for SVGP components.

The reference asserts internal call counts via mock contexts; the JAX analogue asserts the
functional contract instead: ELBO finite, gradients flow to variational parameters AND
kernel hyperparameters, eval posterior is a valid MVN, and KL ≥ 0."""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

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

    # -- inherited matrix ----------------------------------------------------------------------
    def test_elbo_finite_and_grads_flow(self):
        x, y = self.create_data()
        for mll_cls in self.mll_classes:
            model = self.create_model()
            lik = GaussianLikelihood()
            _ = model(x[:4])  # eager variational init
            params = {**{f"m.{k}": v for k, v in model.trainable_params().items()},
                      **{f"l.{k}": v for k, v in lik.trainable_params().items()}}

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

    def test_kl_nonnegative(self):
        x, _ = self.create_data()
        model = self.create_model()
        _ = model(x[:4])
        kl = model.variational_strategy.kl_divergence(model=model)
        assert bool(jnp.all(jnp.isfinite(kl)))
        assert float(jnp.min(jnp.atleast_1d(kl))) > -1e-4
