"""Final reference test/examples/ breadth: spectral-mixture extrapolation, 2-D
Kronecker-product KISS (regression + variational classification), low-rank linear-kernel
regression, derivative-GP fantasy, and plain unwhitened-SVGP classification.

Reference files mirrored: test/examples/test_spectral_mixture_gp_regression.py,
test_kissgp_kronecker_product_regression.py, test_kissgp_kronecker_product_classification.py,
test_lowrank_gp_regression.py, test_derivative_gp_fantasy.py,
test_simple_gp_classification.py."""

import jax
import jax.numpy as jnp
import optax

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultitaskMultivariateNormal, MultivariateNormal
from gpytorch_tpu.kernels import (
    GridInterpolationKernel,
    LinearKernel,
    RBFKernel,
    RBFKernelGrad,
    ScaleKernel,
    SpectralMixtureKernel,
)
from gpytorch_tpu.likelihoods import (
    BernoulliLikelihood,
    GaussianLikelihood,
    MultitaskGaussianLikelihood,
)
from gpytorch_tpu.means import ConstantMean, ConstantMeanGrad
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood, VariationalELBO
from gpytorch_tpu.models import ApproximateGP, ExactGP
from gpytorch_tpu.variational import (
    CholeskyVariationalDistribution,
    GridInterpolationVariationalStrategy,
    UnwhitenedVariationalStrategy,
)


class _GP(ExactGP):
    def __init__(self, x, y, lik, kernel, mean=None):
        super().__init__(x, y, lik)
        self.mean_module = mean if mean is not None else ConstantMean()
        self.covar_module = kernel

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def _train_exact(model, x, y, iters=50, lr=0.1):
    params = model.trainable_params()
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m = model.with_params(p)
            return -jnp.sum(ExactMarginalLogLikelihood(m.likelihood, m)(m(x), y))

        loss, grads = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(grads, s)
        return optax.apply_updates(p, u), s, loss

    for _ in range(iters):
        params, state, loss = step(params, state)
    return model.with_params(params).eval(), float(loss)


def _train_elbo(model, lik, x, y, num_data, iters=100, lr=0.1):
    _ = model(x[:4])  # eager init of variational params
    params = {**{f"m.{k}": v for k, v in model.trainable_params().items()},
              **{f"l.{k}": v for k, v in lik.trainable_params().items()}}
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m = model.with_params({k[2:]: v for k, v in p.items() if k.startswith("m.")})
            l = lik.with_params({k[2:]: v for k, v in p.items() if k.startswith("l.")})
            return -jnp.sum(VariationalELBO(l, m, num_data=num_data)(m(x), y))

        loss, grads = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(grads, s)
        return optax.apply_updates(p, u), s, loss

    for _ in range(iters):
        params, state, loss = step(params, state)
    model = model.with_params({k[2:]: v for k, v in params.items() if k.startswith("m.")}).eval()
    lik = lik.with_params({k[2:]: v for k, v in params.items() if k.startswith("l.")})
    return model, lik


# ------------------------------------------------------------------ spectral mixture
def test_spectral_mixture_gp_regression():
    """SM kernel learns a sine and extrapolates past the training range
    (reference test_spectral_mixture_gp_regression.py:67-104)."""
    train_x = jnp.linspace(0, 1, 15)
    train_y = jnp.sin(train_x * 2 * jnp.pi)
    test_x = jnp.linspace(0, 1.2, 51)  # extrapolation: 20% past the data
    test_y = jnp.sin(test_x * 2 * jnp.pi)

    lik = GaussianLikelihood(noise_constraint=gp.constraints.GreaterThan(1e-5))
    lik.noise = 1e-4
    kern = SpectralMixtureKernel(num_mixtures=4, ard_num_dims=1)
    kern = kern.initialize_from_data(train_x[:, None], train_y)
    model = _GP(train_x, train_y, lik, kern)
    model, _ = _train_exact(model, train_x, train_y, iters=300, lr=0.05)

    pred = model.likelihood(model(test_x))
    mae = float(jnp.mean(jnp.abs(pred.mean - test_y)))
    assert mae < 0.15, f"SM extrapolation MAE {mae}"
    in_range = float(jnp.mean(jnp.abs(pred.mean[test_x <= 1.0] - test_y[test_x <= 1.0])))
    assert in_range < 0.05, f"SM interpolation MAE {in_range}"


# ------------------------------------------------------- 2-D Kronecker-product KISS-GP
def _grid_xy(n, key=0, noise=0.01):
    g = jnp.linspace(0, 1, n)
    xx, yy = jnp.meshgrid(g, g, indexing="ij")
    x = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)
    y = jnp.sin((x[:, 0] + x[:, 1]) * 2 * jnp.pi)
    y = y + noise * jax.random.normal(jax.random.PRNGKey(key), y.shape)
    return x, y


def test_kissgp_kronecker_product_regression():
    """2-D SKI: Toeplitz-per-dim Kronecker grid covariance
    (reference test_kissgp_kronecker_product_regression.py:68-100, gate 0.2)."""
    train_x, train_y = _grid_xy(20, key=0)
    test_x, test_y = _grid_xy(7, key=1)

    lik = GaussianLikelihood()
    kern = GridInterpolationKernel(RBFKernel(ard_num_dims=2), grid_size=14, num_dims=2)
    model = _GP(train_x, train_y, lik, kern)
    model, _ = _train_exact(model, train_x, train_y, iters=20, lr=0.1)

    pred = model.likelihood(model(test_x))
    mae = float(jnp.mean(jnp.abs(pred.mean - test_y)))
    assert mae < 0.2, f"2-D KISS MAE {mae}"


def test_kissgp_kronecker_product_classification():
    """2-D grid-interpolation variational classification
    (reference test_kissgp_kronecker_product_classification.py)."""
    train_x, yf = _grid_xy(12, key=2, noise=0.0)
    train_y = (yf > 0).astype(train_x.dtype)

    class Cls(ApproximateGP):
        def __init__(self):
            dist = CholeskyVariationalDistribution(8 * 8)
            strat = GridInterpolationVariationalStrategy(
                self, grid_size=8, grid_bounds=[(0.0, 1.0), (0.0, 1.0)],
                variational_distribution=dist,
            )
            super().__init__(strat)
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel(ard_num_dims=2))

        def forward(self, x):
            return MultivariateNormal(self.mean_module(x), self.covar_module(x))

    lik = BernoulliLikelihood()
    model, lik = _train_elbo(Cls(), lik, train_x, train_y, num_data=train_y.shape[0], iters=150)
    probs = lik(model(train_x)).mean
    err = float(jnp.mean(jnp.abs(jnp.round(probs) - train_y)))
    assert err < 0.05, f"2-D KISS classification error {err}"


# ----------------------------------------------------------------- low-rank (linear)
def test_lowrank_linear_gp_regression():
    """Linear-kernel exact GP on genuinely low-rank data solves through the feature-space
    Woodbury path (reference test_lowrank_gp_regression.py LinearRegressionModel)."""
    key = jax.random.PRNGKey(0)
    n, d = 128, 4
    x = jax.random.normal(key, (n, d))
    w = jnp.asarray([0.5, -1.0, 0.25, 2.0])
    y = x @ w + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (n,))

    lik = GaussianLikelihood(noise_constraint=gp.constraints.GreaterThan(1e-3))
    model = _GP(x, y, lik, ScaleKernel(LinearKernel()))
    model, _ = _train_exact(model, x, y, iters=60, lr=0.1)

    test_x = jax.random.normal(jax.random.PRNGKey(2), (32, d))
    pred = model.likelihood(model(test_x))
    mae = float(jnp.mean(jnp.abs(pred.mean - test_x @ w)))
    assert mae < 0.1, f"low-rank linear GP MAE {mae}"


# ------------------------------------------------------------- derivative-GP fantasy
def test_derivative_gp_fantasy():
    """Fantasy update on a derivative GP (multitask targets: value + gradients) runs and
    matches a from-scratch refit (reference test_derivative_gp_fantasy.py:44-59)."""
    d = 2
    key = jax.random.PRNGKey(0)
    n = 10
    x = jax.random.uniform(key, (n, d))

    def f(x):
        return jnp.sin(2 * x[..., 0]) * jnp.cos(x[..., 1])

    y_val = f(x)
    y_grad = jax.vmap(jax.grad(f))(x)
    y = jnp.concatenate([y_val[:, None], y_grad], axis=-1)  # (n, 1+d)

    class DerivGP(ExactGP):
        def __init__(self, tx, ty, lik):
            super().__init__(tx, ty, lik)
            self.mean_module = ConstantMeanGrad()
            self.covar_module = ScaleKernel(RBFKernelGrad(ard_num_dims=d))

        def forward(self, xx):
            return MultitaskMultivariateNormal(self.mean_module(xx), self.covar_module(xx))

    lik = MultitaskGaussianLikelihood(num_tasks=1 + d)
    model = DerivGP(x, y, lik).eval()
    test_x = jax.random.uniform(jax.random.PRNGKey(3), (4, d))
    _ = model(test_x)  # fill caches

    new_x = jax.random.uniform(jax.random.PRNGKey(4), (2, d))
    new_y = jnp.concatenate(
        [f(new_x)[:, None], jax.vmap(jax.grad(f))(new_x)], axis=-1
    )
    fant = model.get_fantasy_model(new_x, new_y)
    pred_fant = fant(test_x)
    assert bool(jnp.all(jnp.isfinite(pred_fant.mean)))

    refit = DerivGP(
        jnp.concatenate([x, new_x]), jnp.concatenate([y, new_y]), lik
    ).eval()
    pred_refit = refit(test_x)
    assert float(jnp.max(jnp.abs(pred_fant.mean - pred_refit.mean))) < 1e-3


# ------------------------------------------------- plain unwhitened SVGP classification
def test_simple_gp_classification_unwhitened():
    """Unwhitened SVGP with inducing = train points nails the training labels
    (reference test_simple_gp_classification.py:17-79; same data).

    The unwhitened ELBO landscape is stiff in f64 (the K_ZZ-space quadratic term lives on
    jitter-floored eigendirections), so this uses the reference's f32-equivalent variational
    jitter (1e-4) and a longer Adam budget than the whitened tests."""
    n = 10
    train_x = jnp.linspace(0, 1, n)
    train_y = (jnp.sign(jnp.cos(train_x * 4 * jnp.pi)) + 1) / 2

    class Cls(ApproximateGP):
        def __init__(self, inducing):
            dist = CholeskyVariationalDistribution(inducing.shape[0], dtype=jnp.float64)
            strat = UnwhitenedVariationalStrategy(
                self, inducing, dist, learn_inducing_locations=False, jitter_val=1e-4
            )
            super().__init__(strat)
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel())

        def forward(self, x):
            return MultivariateNormal(self.mean_module(x), self.covar_module(x))

    lik = BernoulliLikelihood()
    model, lik = _train_elbo(Cls(train_x[:, None]), lik, train_x, train_y,
                             num_data=n, iters=800)
    preds = jnp.round(lik(model(train_x)).mean)
    err = float(jnp.mean(jnp.abs(preds - train_y)))
    assert err < 1e-5, f"unwhitened classification error {err}"
