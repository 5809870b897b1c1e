"""Integration configs mirroring reference test/examples/ files not yet covered:
missing data (NaN policies), batch GP regression, fixed-noise likelihood, Dirichlet
classification, Hadamard multitask, LCM multitask (reference test/examples/
test_missing_data.py, test_batch_gp_regression.py, test_white_noise_regression.py,
test_dirichlet_classification.py, test_hadamard_multitask_gp_regression.py,
test_lcm_kernel.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultitaskMultivariateNormal, MultivariateNormal
from gpytorch_tpu.kernels import IndexKernel, LCMKernel, MaternKernel, RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import (
    DirichletClassificationLikelihood,
    FixedNoiseGaussianLikelihood,
    GaussianLikelihood,
    HadamardGaussianLikelihood,
)
from gpytorch_tpu.means import ConstantMean, MultitaskMean
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
from gpytorch_tpu.models import ExactGP


class _GP(ExactGP):
    def __init__(self, x, y, lik, kernel=None, mean=None):
        super().__init__(x, y, lik)
        self.mean_module = mean if mean is not None else ConstantMean()
        self.covar_module = kernel if kernel is not None else ScaleKernel(RBFKernel())

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def _train(model, x, y, iters=60, lr=0.1, **mll_kwargs):
    params = model.trainable_params()
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m = model.with_params(p)
            out = m(x)
            # batched models return per-batch MLLs — sum (reference sums batch losses)
            return -jnp.sum(ExactMarginalLogLikelihood(m.likelihood, m)(out, y, **mll_kwargs))

        loss, grads = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(grads, s)
        return optax.apply_updates(p, u), s, loss

    for _ in range(iters):
        params, state, loss = step(params, state)
    return model.with_params(params), float(loss)


def test_missing_data_nan_policies():
    """Reference test/examples/test_missing_data.py: train with NaN observations."""
    n = 48
    x = jnp.linspace(0, 1, n)
    y = jnp.sin(2 * jnp.pi * x)
    y = y.at[jnp.asarray([3, 10, 25, 40])].set(jnp.nan)
    results = {}
    for policy in ["mask", "fill"]:
        model = _GP(x, y, GaussianLikelihood())
        with gp.settings.observation_nan_policy(policy):
            model, loss = _train(model, x, y, iters=50)
        assert np.isfinite(loss), f"policy {policy} loss not finite"
        model = model.eval()
        test_x = jnp.linspace(0.05, 0.95, 11)
        with gp.settings.observation_nan_policy(policy):
            pred = model.likelihood(model(test_x))
        mae = float(jnp.mean(jnp.abs(pred.mean - jnp.sin(2 * jnp.pi * test_x))))
        results[policy] = mae
        assert mae < 0.15, f"policy {policy} MAE {mae}"


def test_batch_gp_regression():
    """Reference test/examples/test_batch_gp_regression.py: a batch of 3 independent GPs
    trained jointly through batched kernels/means."""
    b, n = 3, 40
    x = jnp.broadcast_to(jnp.linspace(0, 1, n), (b, n))[..., None]
    phases = jnp.asarray([0.0, 0.4, 0.9])[:, None]
    y = jnp.sin(2 * jnp.pi * (x[..., 0] + phases))

    class BatchGP(ExactGP):
        def __init__(self, tx, ty, lik):
            super().__init__(tx, ty, lik)
            self.mean_module = ConstantMean(batch_shape=(b,))
            self.covar_module = ScaleKernel(RBFKernel(batch_shape=(b,)), batch_shape=(b,))

        def forward(self, xx):
            return MultivariateNormal(self.mean_module(xx), self.covar_module(xx))

    model = BatchGP(x, y, GaussianLikelihood(batch_shape=(b,)))
    model, loss = _train(model, x, y, iters=60)
    assert np.isfinite(loss)
    model = model.eval()
    pred = model.likelihood(model(x))
    mae = float(jnp.mean(jnp.abs(pred.mean - y)))
    assert mae < 0.15, f"batch GP MAE {mae}"


def test_fixed_noise_regression():
    """Reference test/examples/test_white_noise_regression.py analogue: known per-point
    noise via FixedNoiseGaussianLikelihood."""
    n = 48
    x = jnp.linspace(0, 1, n)
    noise = jnp.full((n,), 1e-3)
    y = jnp.sin(2 * jnp.pi * x) + jnp.sqrt(noise) * jax.random.normal(jax.random.PRNGKey(0), (n,))
    lik = FixedNoiseGaussianLikelihood(noise=noise, learn_additional_noise=True)
    model = _GP(x, y, lik)
    model, loss = _train(model, x, y, iters=50)
    assert np.isfinite(loss)
    model = model.eval()
    pred = model(jnp.linspace(0.05, 0.95, 11))
    mae = float(jnp.mean(jnp.abs(pred.mean - jnp.sin(2 * jnp.pi * jnp.linspace(0.05, 0.95, 11)))))
    assert mae < 0.1, f"fixed-noise MAE {mae}"


def test_dirichlet_classification():
    """Reference test/examples/test_dirichlet_classification.py: 2-class GP classification
    via Dirichlet regression (batched one-GP-per-class)."""
    key = jax.random.PRNGKey(0)
    n = 40
    x = jnp.concatenate([
        jax.random.normal(key, (n // 2, 2)) * 0.5 + 1.5,
        jax.random.normal(jax.random.PRNGKey(1), (n // 2, 2)) * 0.5 - 1.5,
    ])
    labels = jnp.concatenate([jnp.zeros(n // 2, dtype=jnp.int32), jnp.ones(n // 2, dtype=jnp.int32)])
    lik = DirichletClassificationLikelihood(labels, dtype=jnp.float64)
    num_classes = lik.num_classes

    class DirichletGP(ExactGP):
        def __init__(self, tx, ty, likl):
            super().__init__(tx, ty, likl)
            self.mean_module = ConstantMean(batch_shape=(num_classes,))
            self.covar_module = ScaleKernel(
                RBFKernel(batch_shape=(num_classes,)), batch_shape=(num_classes,)
            )

        def forward(self, xx):
            return MultivariateNormal(self.mean_module(xx), self.covar_module(xx))

    model = DirichletGP(x, lik.transformed_targets, lik)
    model, loss = _train(model, x, lik.transformed_targets, iters=50)
    assert np.isfinite(loss)
    model = model.eval()
    pred = model(x)  # batched (num_classes, n) latent posteriors
    pred_class = jnp.argmax(pred.mean, axis=0)
    accuracy = float(jnp.mean((pred_class == labels).astype(jnp.float32)))
    assert accuracy > 0.9, f"Dirichlet classification accuracy {accuracy}"


def test_hadamard_multitask_regression():
    """Reference test/examples/test_hadamard_multitask_gp_regression.py: task ids as an
    input feature; IndexKernel ⊙ data kernel, per-task noise likelihood."""
    n = 30
    x_data = jnp.linspace(0, 1, n)
    # interleave two tasks
    x = jnp.stack([jnp.concatenate([x_data, x_data]), jnp.concatenate([jnp.zeros(n), jnp.ones(n)])], axis=-1)
    y = jnp.concatenate([jnp.sin(2 * jnp.pi * x_data), jnp.cos(2 * jnp.pi * x_data)])
    task_idx = x[:, 1].astype(jnp.int32)

    class HadamardGP(ExactGP):
        def __init__(self, tx, ty, lik):
            super().__init__(tx, ty, lik)
            self.mean_module = ConstantMean()
            self.data_kernel = RBFKernel(active_dims=(0,))
            self.task_kernel = IndexKernel(num_tasks=2, rank=1, active_dims=(1,))

        def forward(self, xx):
            covar = self.data_kernel(xx) * self.task_kernel(xx)
            return MultivariateNormal(self.mean_module(xx), covar)

    lik = HadamardGaussianLikelihood(num_tasks=2)
    model = HadamardGP(x, y, lik)

    params = model.trainable_params()
    opt = optax.adam(0.1)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m = model.with_params(p)
            return -ExactMarginalLogLikelihood(m.likelihood, m)(m(x), y, task_idx)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(grads, s)
        return optax.apply_updates(p, u), s, loss

    for _ in range(60):
        params, state, loss = step(params, state)
    assert np.isfinite(float(loss))


def test_lcm_multitask_regression():
    """Reference test/examples/test_lcm_kernel.py: LCM (sum of coregionalized kernels)."""
    n = 32
    x = jnp.linspace(0, 1, n)
    y = jnp.stack([jnp.sin(2 * jnp.pi * x), jnp.cos(2 * jnp.pi * x)], axis=-1)

    class LCMGP(ExactGP):
        def __init__(self, tx, ty, lik):
            super().__init__(tx, ty, lik)
            self.mean_module = MultitaskMean(ConstantMean(), num_tasks=2)
            self.covar_module = LCMKernel(
                [RBFKernel(), MaternKernel(nu=1.5)], num_tasks=2, rank=1
            )

        def forward(self, xx):
            return MultitaskMultivariateNormal(self.mean_module(xx), self.covar_module(xx))

    from gpytorch_tpu.likelihoods import MultitaskGaussianLikelihood

    model = LCMGP(x, y, MultitaskGaussianLikelihood(num_tasks=2))
    model, loss = _train(model, x, y, iters=60)
    assert np.isfinite(loss)
    model = model.eval()
    pred = model.likelihood(model(x))
    mae = float(jnp.mean(jnp.abs(pred.mean - y)))
    assert mae < 0.15, f"LCM MAE {mae}"


def test_skip_additive_kissgp_regression():
    """SKIP config (reference test/examples/test_kissgp_additive_regression pattern):
    AdditiveStructureKernel over a 1-d GridInterpolationKernel for a 2-d additive target."""
    from gpytorch_tpu.kernels import AdditiveStructureKernel, GridInterpolationKernel

    key = jax.random.PRNGKey(0)
    n = 128
    x = jax.random.uniform(key, (n, 2))
    y = jnp.sin(2 * jnp.pi * x[:, 0]) + jnp.cos(2 * jnp.pi * x[:, 1])
    y = y + 0.03 * jax.random.normal(jax.random.PRNGKey(1), (n,))

    class SKIPGP(ExactGP):
        def __init__(self, tx, ty, lik):
            super().__init__(tx, ty, lik)
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(
                AdditiveStructureKernel(
                    GridInterpolationKernel(RBFKernel(), grid_size=64, num_dims=1,
                                            grid_bounds=[(-0.1, 1.1)]),
                    num_dims=2,
                )
            )

        def forward(self, xx):
            return MultivariateNormal(self.mean_module(xx), self.covar_module(xx))

    model = SKIPGP(x, y, GaussianLikelihood())
    model, loss = _train(model, x, y, iters=60)
    assert np.isfinite(loss)
    model = model.eval()
    test_x = jax.random.uniform(jax.random.PRNGKey(2), (32, 2), minval=0.05, maxval=0.95)
    pred = model.likelihood(model(test_x))
    truth = jnp.sin(2 * jnp.pi * test_x[:, 0]) + jnp.cos(2 * jnp.pi * test_x[:, 1])
    mae = float(jnp.mean(jnp.abs(pred.mean - truth)))
    assert mae < 0.15, f"SKIP MAE {mae}"
