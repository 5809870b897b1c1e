"""Deep GP regression (reference test/examples deep-GP configs), DSPP, GP classification
(reference test_simple_gp_classification.py / test_svgp_gp_classification.py), and
model-list tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import BernoulliLikelihood, GaussianLikelihood
from gpytorch_tpu.means import ConstantMean, LinearMean
from gpytorch_tpu.mlls import (
    DeepApproximateMLL,
    ExactMarginalLogLikelihood,
    SumMarginalLogLikelihood,
    VariationalELBO,
)
from gpytorch_tpu.models import ApproximateGP, DeepGP, DeepGPLayer, ExactGP, IndependentModelList
from gpytorch_tpu.variational import CholeskyVariationalDistribution, VariationalStrategy


class ToyDeepGPHiddenLayer(DeepGPLayer):
    def __init__(self, input_dims, output_dims, num_inducing=16):
        batch = () if output_dims is None else (output_dims,)
        inducing_points = jax.random.uniform(
            jax.random.PRNGKey(0), batch + (num_inducing, input_dims), dtype=jnp.float64
        )
        variational_distribution = CholeskyVariationalDistribution(
            num_inducing, batch_shape=batch, dtype=jnp.float64
        )
        strategy = VariationalStrategy(self, inducing_points, variational_distribution, jitter_val=1e-4)
        super().__init__(strategy, input_dims, output_dims)
        self.mean_module = LinearMean(input_dims, dtype=jnp.float64) if output_dims else ConstantMean(dtype=jnp.float64)
        self.covar_module = ScaleKernel(RBFKernel(ard_num_dims=input_dims, dtype=jnp.float64), dtype=jnp.float64)

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


class TwoLayerDeepGP(DeepGP):
    def __init__(self):
        super().__init__()
        self.hidden_layer = ToyDeepGPHiddenLayer(1, 2)
        self.last_layer = ToyDeepGPHiddenLayer(2, None)
        self.likelihood = GaussianLikelihood(dtype=jnp.float64)

    def forward(self, x, key=None):
        k1, k2 = jax.random.split(key if key is not None else jax.random.PRNGKey(0))
        hidden = self.hidden_layer(x, key=k1)
        return self.last_layer(hidden, key=k2)


def test_two_layer_deep_gp_trains():
    train_x = jnp.linspace(0, 1, 64, dtype=jnp.float64)[:, None]
    train_y = jnp.sin(train_x[:, 0] * 2 * jnp.pi).astype(jnp.float64)
    model = TwoLayerDeepGP()
    _ = model(train_x)  # eager init
    params = model.trainable_params()
    opt = optax.adam(0.05)
    state = opt.init(params)
    mll_fn = lambda m: DeepApproximateMLL(VariationalELBO(m.likelihood, m, num_data=64))

    @jax.jit
    def step(p, s, key):
        def loss_fn(p):
            m = model.with_params(p)
            out = m(train_x, key=key)
            return -mll_fn(m)(out, train_y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(grads, s)
        return optax.apply_updates(p, u), s, loss

    key = jax.random.PRNGKey(7)
    losses = []
    with gp.settings.num_likelihood_samples(8):
        for i in range(60):
            key, sub = jax.random.split(key)
            params, state, loss = step(params, state, sub)
            losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.1, f"Deep GP did not train: {losses[0]} -> {losses[-1]}"
    # predictions
    model = model.with_params(params).eval()
    with gp.settings.num_likelihood_samples(16):
        out = model(train_x, key=jax.random.PRNGKey(0))
    mean = jnp.mean(out.mean, axis=0)  # average over sample dim
    mae = float(jnp.mean(jnp.abs(mean - train_y)))
    assert mae < 0.35, f"Deep GP MAE {mae}"


class SVGPClassificationModel(ApproximateGP):
    def __init__(self, inducing_points):
        variational_distribution = CholeskyVariationalDistribution(
            inducing_points.shape[-2], dtype=inducing_points.dtype
        )
        strategy = VariationalStrategy(self, inducing_points, variational_distribution, jitter_val=1e-4)
        super().__init__(strategy)
        self.mean_module = ConstantMean(dtype=inducing_points.dtype)
        self.covar_module = ScaleKernel(RBFKernel(dtype=inducing_points.dtype))

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def test_svgp_classification():
    """Mirrors reference test_svgp_gp_classification.py — accuracy on separable labels."""
    train_x = jnp.linspace(0, 1, 64, dtype=jnp.float64)
    train_y = (jnp.sin(train_x * 2 * jnp.pi) > 0).astype(jnp.float64)
    model = SVGPClassificationModel(jnp.linspace(0, 1, 16, dtype=jnp.float64)[:, None])
    lik = BernoulliLikelihood()
    _ = model(train_x[:4])
    params = model.trainable_params()
    opt = optax.adam(0.1)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m = model.with_params(p)
            return -VariationalELBO(lik, m, num_data=64)(m(train_x), train_y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(grads, s)
        return optax.apply_updates(p, u), s, loss

    for _ in range(150):
        params, state, loss = step(params, state)
    model = model.with_params(params).eval()
    pred = lik(model(train_x))
    acc = float(jnp.mean(((pred.probs > 0.5).astype(jnp.float64) == train_y).astype(jnp.float64)))
    assert acc > 0.95, f"classification accuracy {acc}"


def test_bernoulli_quadrature_vs_mc():
    """Quadrature expected_log_prob should match a large-sample MC estimate."""
    lik = BernoulliLikelihood()
    mean = jnp.asarray([0.5, -1.0, 2.0])
    var = jnp.asarray([0.3, 0.5, 1.0])
    from gpytorch_tpu.linop import DiagLinearOperator

    dist = MultivariateNormal(mean, DiagLinearOperator(var))
    y = jnp.asarray([1.0, 0.0, 1.0])
    quad = lik.expected_log_prob(y, dist)
    key = jax.random.PRNGKey(0)
    samples = dist.rsample(key, (20000,))
    mc = jnp.mean(jax.scipy.stats.norm.logcdf((2 * y - 1) * samples), axis=0)
    np.testing.assert_allclose(np.asarray(quad), np.asarray(mc), atol=0.02)


def test_independent_model_list():
    class SimpleGP(ExactGP):
        def __init__(self, tx, ty, lik):
            super().__init__(tx, ty, lik)
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel())

        def forward(self, x):
            return MultivariateNormal(self.mean_module(x), self.covar_module(x))

    x1 = jnp.linspace(0, 1, 20)
    y1 = jnp.sin(x1 * 2 * jnp.pi)
    x2 = jnp.linspace(0, 1, 30)
    y2 = jnp.cos(x2 * 2 * jnp.pi)
    m1 = SimpleGP(x1, y1, GaussianLikelihood())
    m2 = SimpleGP(x2, y2, GaussianLikelihood())
    model = IndependentModelList(m1, m2)
    mll = SumMarginalLogLikelihood(model.likelihood, model)
    outputs = model(x1, x2)
    loss = -mll(outputs, [y1, y2])
    assert np.isfinite(float(loss))
    model.train(False)
    preds = model(x1, x2)
    assert preds[0].mean.shape == (20,)
    assert preds[1].mean.shape == (30,)


def test_non_gaussian_likelihood_forward_shapes():
    from gpytorch_tpu.likelihoods import (
        BetaLikelihood,
        LaplaceLikelihood,
        NegativeBinomialLikelihood,
        PoissonLikelihood,
        SoftmaxLikelihood,
        StudentTLikelihood,
    )

    f = jnp.asarray([[0.1, -0.5, 1.2]])
    assert BetaLikelihood()(f).mean.shape == (1, 3)
    assert LaplaceLikelihood()(f).mean.shape == (1, 3)
    assert StudentTLikelihood()(f).mean.shape == (1, 3)
    assert PoissonLikelihood()(f).mean.shape == (1, 3)
    assert NegativeBinomialLikelihood()(f).mean.shape == (1, 3)
    sm = SoftmaxLikelihood(num_features=4, num_classes=3)
    f4 = jax.random.normal(jax.random.PRNGKey(0), (4, 10))  # (features, n)
    cat = sm(f4)
    assert cat.probs.shape == (10, 3)
