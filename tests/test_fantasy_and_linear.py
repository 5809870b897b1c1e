"""Fantasy/online updates and the feature-space linear prediction strategy.

Reference: exact rank-one updates (gpytorch/models/exact_prediction_strategies.py:137-265),
WISKI (:560-677, arXiv 2103.01454), OVC variational fantasy
(gpytorch/variational/_variational_strategy.py:169-323, arXiv 2110.15172), and
LinearPredictionStrategy (:830-1019)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import GridInterpolationKernel, RBFKernel, RFFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.models import ApproximateGP, ExactGP
from gpytorch_tpu.variational import CholeskyVariationalDistribution, VariationalStrategy


class _GP(ExactGP):
    def __init__(self, x, y, lik, kernel):
        super().__init__(x, y, lik)
        self.mean_module = ConstantMean()
        self.covar_module = kernel

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def _data(n=48, key=0):
    x = jnp.linspace(0, 1, n)
    y = jnp.sin(2 * jnp.pi * x) + 0.05 * jax.random.normal(jax.random.PRNGKey(key), (n,))
    return x, y


def test_exact_fantasy_matches_refit():
    x, y = _data()
    new_x = jnp.asarray([0.33, 0.71])
    new_y = jnp.sin(2 * jnp.pi * new_x)
    test_x = jnp.linspace(0.05, 0.95, 9)

    lik = GaussianLikelihood()
    lik.noise = 0.05
    model = _GP(x, y, lik, ScaleKernel(RBFKernel())).eval()
    _ = model(test_x)  # build the prediction strategy (so fantasy uses the Schur update)
    fant = model.get_fantasy_model(new_x, new_y)
    assert fant._cache.get("prediction_strategy") is not None, "fantasy must reuse caches"
    pred_fant = fant(test_x)

    refit = _GP(
        jnp.concatenate([x, new_x]), jnp.concatenate([y, new_y]), lik, ScaleKernel(RBFKernel())
    ).eval()
    pred_refit = refit(test_x)
    np.testing.assert_allclose(np.asarray(pred_fant.mean), np.asarray(pred_refit.mean), atol=1e-4)


def test_wiski_fantasy_matches_refit():
    x, y = _data(64)
    lik = GaussianLikelihood()
    lik.noise = 0.05
    kernel = GridInterpolationKernel(RBFKernel(), grid_size=32, num_dims=1, grid_bounds=[(-0.1, 1.1)])
    model = _GP(x, y, lik, kernel).eval()
    test_x = jnp.linspace(0.05, 0.95, 9)
    _ = model(test_x)

    new_x = jnp.asarray([0.25, 0.6])
    new_y = jnp.sin(2 * jnp.pi * new_x)
    fant = model.get_fantasy_model(new_x, new_y)
    from gpytorch_tpu.models.exact_prediction_strategies import WiskiPredictionStrategy

    assert isinstance(fant._cache.get("prediction_strategy"), WiskiPredictionStrategy)
    pred_fant = fant(test_x)

    refit = _GP(
        jnp.concatenate([x, new_x]), jnp.concatenate([y, new_y]), lik,
        GridInterpolationKernel(RBFKernel(), grid_size=32, num_dims=1, grid_bounds=[(-0.1, 1.1)]),
    ).eval()
    pred_refit = refit(test_x)
    np.testing.assert_allclose(np.asarray(pred_fant.mean), np.asarray(pred_refit.mean), atol=5e-3)
    with gp.settings.fast_pred_var(True):
        var_fant = fant(test_x).variance
    np.testing.assert_allclose(np.asarray(var_fant), np.asarray(pred_refit.variance), atol=5e-3)


def test_rff_linear_prediction_strategy():
    x, y = _data(96)
    lik = GaussianLikelihood()
    lik.noise = 0.05
    kernel = RFFKernel(num_samples=64, num_dims=1)
    model = _GP(x, y, lik, kernel).eval()
    test_x = jnp.linspace(0.05, 0.95, 15)
    pred = model.likelihood(model(test_x))
    # the feature-space Woodbury must agree with the dense-exact posterior
    from gpytorch_tpu.models.exact_prediction_strategies import DefaultPredictionStrategy

    dense_model = _GP(x, y, lik, kernel).eval()
    strat = DefaultPredictionStrategy(
        dense_model.train_inputs, dense_model.forward(x[:, None]), y, lik
    )
    dense_model._cache["prediction_strategy"] = strat
    pred_dense = dense_model.likelihood(dense_model(test_x))
    np.testing.assert_allclose(np.asarray(pred.mean), np.asarray(pred_dense.mean), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pred.variance), np.asarray(pred_dense.variance), atol=1e-5)


def test_variational_fantasy_ovc():
    x, y = _data(96)
    Z = jnp.linspace(0, 1, 20)[:, None]

    class SVGP(ApproximateGP):
        def __init__(self):
            vd = CholeskyVariationalDistribution(20)
            strategy = VariationalStrategy(self, Z, vd, learn_inducing_locations=False, jitter_val=1e-6)
            super().__init__(strategy)
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel())
            self.likelihood = GaussianLikelihood()

        def forward(self, xx):
            return MultivariateNormal(self.mean_module(xx), self.covar_module(xx))

    import optax

    from gpytorch_tpu.mlls import VariationalELBO

    model = SVGP()
    model.likelihood.noise = 0.05
    _ = model(x[:4])
    params = model.trainable_params()
    opt = optax.adam(0.08)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m = model.with_params(p)
            return -VariationalELBO(m.likelihood, m, num_data=x.shape[0])(m(x), y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(grads, s)
        return optax.apply_updates(p, u), s, loss

    for _ in range(400):
        params, state, _ = step(params, state)
    model = model.with_params(params)

    # the amortized exact GP should reproduce the variational posterior (exact identity in
    # principle; finite-jitter (R Rᵀ+ε)⁻¹ in near-prior directions costs some slack)
    test_x = jnp.linspace(0.05, 0.95, 9)
    model.eval()
    pred_var = model(test_x)
    exact = model.variational_strategy.amortized_exact_gp(model=model).eval()
    pred_exact = exact(test_x)
    np.testing.assert_allclose(np.asarray(pred_exact.mean), np.asarray(pred_var.mean), atol=0.1)

    # OVC: fantasy conditioning shifts the posterior toward the new observations
    new_x = jnp.asarray([0.5])
    new_y = jnp.asarray([2.0])  # far from sin(π) = 0
    fant = model.variational_strategy.get_fantasy_model(new_x, new_y, model=model)
    fant.eval()
    before = float(model(jnp.asarray([0.5])).mean[0])
    after = float(fant(jnp.asarray([0.5])).mean[0])
    assert after > before + 0.3, (before, after)
    assert np.isfinite(after)


def test_fixed_noise_fantasy_matches_refit():
    """Reference test/examples/test_fixed_noise_fanatasy_updates.py: fantasy updates on a
    FixedNoiseGaussianLikelihood model extend the per-point noise and match a from-scratch
    model conditioned on the joint data."""
    from gpytorch_tpu.likelihoods import FixedNoiseGaussianLikelihood

    n = 11
    x = jnp.linspace(0, 1, n)
    y = jnp.sin(x * 2 * jnp.pi)
    noise = jnp.full((n,), 2e-4)
    model = _GP(x, y, FixedNoiseGaussianLikelihood(noise), ScaleKernel(RBFKernel())).eval()
    test_x = jnp.linspace(0.05, 0.95, 7)
    _ = model(test_x)  # builds the prediction strategy (fantasy then rank-m updates it)

    x_new = jnp.asarray([0.25, 0.65])
    y_new = jnp.sin(x_new * 2 * jnp.pi)
    noise_new = jnp.full((2,), 3e-4)
    fant = model.get_fantasy_model(x_new, y_new, noise=noise_new)
    assert fant.likelihood.noise.shape[-1] == n + 2
    p_fant = fant(test_x)

    refit = _GP(
        jnp.concatenate([x, x_new]), jnp.concatenate([y, y_new]),
        FixedNoiseGaussianLikelihood(jnp.concatenate([noise, noise_new])),
        ScaleKernel(RBFKernel()),
    ).eval()
    p_refit = refit(test_x)
    np.testing.assert_allclose(np.asarray(p_fant.mean), np.asarray(p_refit.mean), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_fant.variance), np.asarray(p_refit.variance), atol=1e-4)

    # without the noise kwarg, fantasizing a fixed-noise model must raise (reference :300)
    with pytest.raises(RuntimeError, match="noise"):
        model.get_fantasy_model(x_new, y_new)
