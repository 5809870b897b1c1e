"""SVGP regression (mirrors reference test/examples/test_svgp_gp_regression.py —
accuracy gate MAE < 0.1 at :69-70)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.mlls import PredictiveLogLikelihood, VariationalELBO
from gpytorch_tpu.models import ApproximateGP
from gpytorch_tpu.optim import ngd
from gpytorch_tpu.variational import (
    CholeskyVariationalDistribution,
    MeanFieldVariationalDistribution,
    NaturalVariationalDistribution,
    UnwhitenedVariationalStrategy,
    VariationalStrategy,
)


class SVGPModel(ApproximateGP):
    def __init__(self, inducing_points, dist_cls=CholeskyVariationalDistribution, strat_cls=VariationalStrategy):
        variational_distribution = dist_cls(inducing_points.shape[-2], dtype=inducing_points.dtype)
        # jitter_val=1e-4 matches the reference unwhitened test
        # (test_unwhitened_svgp_regression.py:28)
        strategy = strat_cls(self, inducing_points, variational_distribution, learn_inducing_locations=True, jitter_val=1e-4)
        super().__init__(strategy)
        self.mean_module = ConstantMean(dtype=inducing_points.dtype)
        self.covar_module = ScaleKernel(RBFKernel(dtype=inducing_points.dtype))

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def _data(n=256):
    key = jax.random.PRNGKey(0)
    train_x = jnp.linspace(0, 1, n)
    train_y = jnp.sin(train_x * 2 * jnp.pi) + 0.1 * jax.random.normal(key, (n,))
    test_x = jnp.linspace(0.02, 0.98, 25)
    test_y = jnp.sin(test_x * 2 * jnp.pi)
    return train_x, train_y, test_x, test_y


def _train_svgp(model, lik, mll_cls, train_x, train_y, iters=150, lr=0.05):
    _ = model(train_x[:4])  # eager init of variational params
    params = model.trainable_params()
    lik_params = lik.trainable_params()
    all_params = {**{f"m.{k}": v for k, v in params.items()}, **{f"l.{k}": v for k, v in lik_params.items()}}
    opt = optax.adam(lr)
    state = opt.init(all_params)
    mll_maker = lambda m, l: mll_cls(l, m, num_data=train_y.shape[0])

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m = model.with_params({k[2:]: v for k, v in p.items() if k.startswith("m.")})
            l = lik.with_params({k[2:]: v for k, v in p.items() if k.startswith("l.")})
            out = m(train_x)
            return -mll_maker(m, l)(out, train_y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    for _ in range(iters):
        all_params, state, loss = step(all_params, state)
    model = model.with_params({k[2:]: v for k, v in all_params.items() if k.startswith("m.")})
    lik = lik.with_params({k[2:]: v for k, v in all_params.items() if k.startswith("l.")})
    return model, lik, float(loss)


@pytest.mark.parametrize("strat_cls", [VariationalStrategy, UnwhitenedVariationalStrategy])
@pytest.mark.parametrize("dist_cls", [CholeskyVariationalDistribution, MeanFieldVariationalDistribution])
def test_svgp_regression(strat_cls, dist_cls):
    train_x, train_y, test_x, test_y = _data()
    Z = jnp.linspace(0, 1, 25)[:, None]
    model = SVGPModel(Z, dist_cls=dist_cls, strat_cls=strat_cls)
    lik = GaussianLikelihood()
    model, lik, loss = _train_svgp(model, lik, VariationalELBO, train_x, train_y)
    model.eval()
    preds = lik(model(test_x))
    mae = float(jnp.mean(jnp.abs(preds.mean - test_y)))
    assert mae < 0.1, f"SVGP MAE {mae} (gate < 0.1, {strat_cls.__name__}/{dist_cls.__name__})"


def test_svgp_ppgpr():
    train_x, train_y, test_x, test_y = _data()
    Z = jnp.linspace(0, 1, 25)[:, None]
    model = SVGPModel(Z)
    lik = GaussianLikelihood()
    model, lik, _ = _train_svgp(model, lik, PredictiveLogLikelihood, train_x, train_y)
    model.eval()
    preds = lik(model(test_x))
    mae = float(jnp.mean(jnp.abs(preds.mean - test_y)))
    assert mae < 0.1, f"PPGPR MAE {mae}"


def test_svgp_ngd_natural():
    """Natural variational distribution + NGD on natural params, Adam on hypers."""
    train_x, train_y, test_x, test_y = _data()
    Z = jnp.linspace(0, 1, 25)[:, None]
    model = SVGPModel(Z, dist_cls=NaturalVariationalDistribution)
    lik = GaussianLikelihood()
    _ = model(train_x[:4])  # init

    num_data = train_y.shape[0]
    params = {**{f"m.{k}": v for k, v in model.trainable_params().items()},
              **{f"l.{k}": v for k, v in lik.trainable_params().items()}}
    is_natural = lambda k: "_variational_distribution.natural" in k
    labels = {k: ("ngd" if is_natural(k) else "adam") for k in params}
    opt = optax.multi_transform(
        {"ngd": ngd(0.05, num_data), "adam": optax.adam(0.05)}, labels
    )
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m = model.with_params({k[2:]: v for k, v in p.items() if k.startswith("m.")})
            l = lik.with_params({k[2:]: v for k, v in p.items() if k.startswith("l.")})
            return -VariationalELBO(l, m, num_data=num_data)(m(train_x), train_y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    for _ in range(150):
        params, state, loss = step(params, state)
    model = model.with_params({k[2:]: v for k, v in params.items() if k.startswith("m.")})
    lik = lik.with_params({k[2:]: v for k, v in params.items() if k.startswith("l.")})
    model.eval()
    preds = lik(model(test_x))
    mae = float(jnp.mean(jnp.abs(preds.mean - test_y)))
    assert mae < 0.1, f"NGD SVGP MAE {mae}"


def test_kl_nonnegative_and_finite():
    Z = jnp.linspace(0, 1, 10)[:, None]
    model = SVGPModel(Z)
    _ = model(jnp.linspace(0, 1, 5))
    kl = model.variational_strategy.kl_divergence(model=model)
    assert np.isfinite(float(kl))
    assert float(kl) > -1e-5
