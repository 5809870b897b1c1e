"""LOVE fast posterior sampling (settings.fast_pred_samples).

Reference: gpytorch/models/exact_prediction_strategies.py:733-744 and
settings.fast_pred_samples (gpytorch/settings.py:225) — the posterior covariance is
returned directly as a low-rank ROOT operator so repeated sample draws are a single
(n_test × q) matvec each; parity gates mirror the LOVE notebook's covar-MAE ≈ 6.6e-4
anchor (BASELINE.md) at test scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import GridInterpolationKernel, RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.linop import RootLinearOperator
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
from gpytorch_tpu.models import ExactGP


def _fit(model, train_x, train_y, iters=40, lr=0.1):
    params = model.trainable_params()
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m = model.with_params(p)
            return -ExactMarginalLogLikelihood(m.likelihood, m)(m(train_x), train_y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(grads, s)
        return optax.apply_updates(p, u), s, loss

    for _ in range(iters):
        params, state, loss = step(params, state)
    return model.with_params(params)


def _data(n=80):
    train_x = jnp.linspace(0, 1, n)
    train_y = jnp.sin(train_x * 2 * jnp.pi) + 0.05 * jax.random.normal(jax.random.PRNGKey(0), (n,))
    test_x = jnp.linspace(0.02, 0.98, 31)
    return train_x, train_y, test_x


class ExactModel(ExactGP):
    def __init__(self, train_x, train_y, likelihood):
        super().__init__(train_x, train_y, likelihood)
        self.mean_module = ConstantMean()
        self.covar_module = ScaleKernel(RBFKernel())

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


class KissModel(ExactGP):
    def __init__(self, train_x, train_y, likelihood):
        super().__init__(train_x, train_y, likelihood)
        self.mean_module = ConstantMean()
        self.covar_module = GridInterpolationKernel(ScaleKernel(RBFKernel()), grid_size=50, num_dims=1)

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def test_default_strategy_fast_pred_samples_covar_parity():
    train_x, train_y, test_x = _data()
    model = _fit(ExactModel(train_x, train_y, GaussianLikelihood()), train_x, train_y)
    model.eval()
    exact_covar = np.asarray(model(test_x).covariance_matrix)
    model._cache.clear()
    with gp.settings.fast_pred_samples(), gp.settings.max_root_decomposition_size(200):
        dist = model(test_x)
        covar = dist.lazy_covariance_matrix
        assert isinstance(covar, RootLinearOperator), type(covar)
        fast_covar = np.asarray(dist.covariance_matrix)
    assert np.max(np.abs(fast_covar - exact_covar)) < 5e-3, (
        np.max(np.abs(fast_covar - exact_covar))
    )


def test_default_strategy_fast_samples_are_cheap_matvecs_and_statistically_valid():
    train_x, train_y, test_x = _data()
    model = _fit(ExactModel(train_x, train_y, GaussianLikelihood()), train_x, train_y)
    model.eval()
    with gp.settings.fast_pred_samples(), gp.settings.max_root_decomposition_size(200):
        dist = model(test_x)
        samples = dist.rsample(jax.random.PRNGKey(1), (4000,))
    emp_mean = np.mean(np.asarray(samples), axis=0)
    emp_var = np.var(np.asarray(samples), axis=0)
    np.testing.assert_allclose(emp_mean, np.asarray(dist.mean), atol=0.05)
    np.testing.assert_allclose(emp_var, np.asarray(dist.variance), rtol=0.25, atol=5e-4)


def test_interpolated_strategy_fast_pred_samples_covar_parity():
    train_x, train_y, test_x = _data(n=100)
    model = _fit(KissModel(train_x, train_y, GaussianLikelihood()), train_x, train_y)
    model.eval()
    exact_covar = np.asarray(model(test_x).covariance_matrix)
    model._cache.clear()
    with gp.settings.fast_pred_samples(), gp.settings.max_root_decomposition_size(200):
        dist = model(test_x)
        covar = dist.lazy_covariance_matrix
        assert isinstance(covar, RootLinearOperator), type(covar)
        fast_covar = np.asarray(dist.covariance_matrix)
    # rank-limited inducing-space root: LOVE-level agreement, not exact
    assert np.max(np.abs(fast_covar - exact_covar)) < 2e-2, (
        np.max(np.abs(fast_covar - exact_covar))
    )


def test_interpolated_sample_cache_is_test_independent():
    train_x, train_y, test_x = _data(n=100)
    model = _fit(KissModel(train_x, train_y, GaussianLikelihood()), train_x, train_y)
    model.eval()
    with gp.settings.fast_pred_samples(), gp.settings.max_root_decomposition_size(200):
        model(test_x)
        strategy = model._cache.get("prediction_strategy")
        cache1 = strategy.interp_sample_cache
        model(test_x[:10])  # different test batch, same cache object
        cache2 = strategy.interp_sample_cache
    assert cache1 is cache2


def test_fast_pred_samples_takes_precedence_over_fast_pred_var():
    train_x, train_y, test_x = _data()
    model = _fit(ExactModel(train_x, train_y, GaussianLikelihood()), train_x, train_y)
    model.eval()
    with gp.settings.fast_pred_samples(), gp.settings.fast_pred_var(), \
         gp.settings.max_root_decomposition_size(200):
        covar = model(test_x).lazy_covariance_matrix
    assert isinstance(covar, RootLinearOperator), type(covar)
