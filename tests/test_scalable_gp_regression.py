"""Scalable exact-GP variants: KISS-GP/SKI (reference test_kissgp_gp_regression.py, gate
MAE < 0.05 at :93), SGPR (reference test_sgpr_regression.py, gate < 0.1 at :120), and RFF."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import (
    GridInterpolationKernel,
    InducingPointKernel,
    RBFKernel,
    RFFKernel,
    ScaleKernel,
)
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
from gpytorch_tpu.models import ExactGP


def _fit(model, train_x, train_y, iters=60, lr=0.1):
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
    return model.with_params(params), float(loss)


def _data(n=100):
    train_x = jnp.linspace(0, 1, n)
    train_y = jnp.sin(train_x * 2 * jnp.pi)
    test_x = jnp.linspace(0.02, 0.98, 51)
    test_y = jnp.sin(test_x * 2 * jnp.pi)
    return train_x, train_y, test_x, test_y


class KissGPModel(ExactGP):
    def __init__(self, train_x, train_y, likelihood):
        super().__init__(train_x, train_y, likelihood)
        self.mean_module = ConstantMean()
        self.base_covar_module = ScaleKernel(RBFKernel())
        self.covar_module = GridInterpolationKernel(self.base_covar_module, grid_size=50, num_dims=1)

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def test_kissgp_gp_mean_abs_error():
    train_x, train_y, test_x, test_y = _data()
    likelihood = GaussianLikelihood()
    model = KissGPModel(train_x, train_y, likelihood)
    model, _ = _fit(model, train_x, train_y, iters=60)
    model.eval()
    preds = model(test_x)
    mae = float(jnp.mean(jnp.abs(preds.mean - test_y)))
    assert mae < 0.05, f"KISS-GP MAE {mae} (reference gate < 0.05)"


def test_kissgp_fast_pred_var():
    train_x, train_y, test_x, test_y = _data()
    likelihood = GaussianLikelihood()
    model = KissGPModel(train_x, train_y, likelihood)
    model, _ = _fit(model, train_x, train_y, iters=40)
    model.eval()
    exact_var = np.asarray(model(test_x).variance)
    model._cache.clear()
    with gp.settings.fast_pred_var():
        love_var = np.asarray(model(test_x).variance)
    rel = np.max(np.abs(love_var - exact_var) / np.maximum(exact_var, 1e-6))
    assert rel < 0.1, f"KISS-GP LOVE rel var err {rel}"


class SGPRModel(ExactGP):
    def __init__(self, train_x, train_y, likelihood):
        super().__init__(train_x, train_y, likelihood)
        self.mean_module = ConstantMean()
        base = ScaleKernel(RBFKernel())
        self.covar_module = InducingPointKernel(
            base, inducing_points=jnp.linspace(0, 1, 32)[:, None], likelihood=likelihood
        )

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def test_sgpr_mean_abs_error():
    train_x, train_y, test_x, test_y = _data(150)
    likelihood = GaussianLikelihood()
    model = SGPRModel(train_x, train_y, likelihood)
    model, _ = _fit(model, train_x, train_y, iters=60)
    model.eval()
    preds = model(test_x)
    mae = float(jnp.mean(jnp.abs(preds.mean - test_y)))
    assert mae < 0.1, f"SGPR MAE {mae} (reference gate < 0.1)"
    # variance sanity (reference :128-134)
    train_preds = model(train_x)
    train_err = float(jnp.mean(jnp.abs(train_preds.mean - train_y)))
    assert train_err < 0.1


class RFFModel(ExactGP):
    def __init__(self, train_x, train_y, likelihood):
        super().__init__(train_x, train_y, likelihood)
        self.mean_module = ConstantMean()
        self.covar_module = ScaleKernel(RFFKernel(num_samples=128))

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def test_rff_gp_regression():
    train_x, train_y, test_x, test_y = _data()
    likelihood = GaussianLikelihood()
    model = RFFModel(train_x, train_y, likelihood)
    model, _ = _fit(model, train_x, train_y, iters=60)
    model.eval()
    preds = model(test_x)
    mae = float(jnp.mean(jnp.abs(preds.mean - test_y)))
    assert mae < 0.1, f"RFF MAE {mae}"


def test_grid_gp_regression():
    """Exact GP on grid-structured data (reference test_grid_gp_regression.py)."""
    from gpytorch_tpu.kernels import GridKernel
    from gpytorch_tpu.utils.grid import create_data_from_grid, create_grid

    grid = create_grid([20], [(0.0, 1.0)], dtype=jnp.float64)
    train_x = create_data_from_grid(grid)
    train_y = jnp.sin(train_x[:, 0] * 2 * jnp.pi)

    class GridGPModel(ExactGP):
        def __init__(self, likelihood):
            super().__init__(train_x, train_y, likelihood)
            self.mean_module = ConstantMean()
            self.covar_module = GridKernel(RBFKernel(), grid=grid)

        def forward(self, x):
            return MultivariateNormal(self.mean_module(x), self.covar_module(x))

    likelihood = GaussianLikelihood()
    model = GridGPModel(likelihood)
    model, _ = _fit(model, train_x, train_y, iters=40)
    model.eval()
    test_x = train_x
    with gp.settings.debug(False):
        preds = model(test_x + 0.0)
    mae = float(jnp.mean(jnp.abs(preds.mean - train_y)))
    assert mae < 0.1, f"Grid GP MAE {mae}"


def test_toeplitz_matmul_matches_dense():
    from gpytorch_tpu.linop import ToeplitzLinearOperator

    col = jnp.asarray([4.0, 1.0, 0.5, 0.25, 0.1])
    op = ToeplitzLinearOperator(col)
    rhs = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
    np.testing.assert_allclose(np.asarray(op.matmul(rhs)), np.asarray(op.to_dense() @ rhs), atol=1e-6)


def test_kronecker_solve_logdet():
    from gpytorch_tpu.linop import DenseLinearOperator, KroneckerProductLinearOperator

    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (4, 4))
    A = A @ A.T + 4 * jnp.eye(4)
    B = jax.random.normal(jax.random.PRNGKey(1), (3, 3))
    B = B @ B.T + 3 * jnp.eye(3)
    kron = KroneckerProductLinearOperator(DenseLinearOperator(A), DenseLinearOperator(B))
    dense = np.kron(np.asarray(A), np.asarray(B))
    np.testing.assert_allclose(np.asarray(kron.to_dense()), dense, atol=1e-8)
    rhs = jax.random.normal(jax.random.PRNGKey(2), (12, 2))
    np.testing.assert_allclose(np.asarray(kron.matmul(rhs)), dense @ np.asarray(rhs), atol=1e-8)
    np.testing.assert_allclose(np.asarray(kron.solve(rhs)), np.linalg.solve(dense, np.asarray(rhs)), atol=1e-6)
    np.testing.assert_allclose(float(kron.logdet()), np.linalg.slogdet(dense)[1], atol=1e-6)


def test_ski_interp_matches_dense_kernel():
    """W K_uu Wᵀ should approximate the dense kernel closely on a fine grid."""
    kern = GridInterpolationKernel(RBFKernel(dtype=jnp.float64), grid_size=80, num_dims=1)
    kern.base_kernel.lengthscale = 0.2
    x = jnp.linspace(0.1, 0.9, 20)[:, None]
    with gp.settings.lazily_evaluate_kernels(False):
        K_ski = np.asarray(kern(x, x).to_dense())
    base = RBFKernel(dtype=jnp.float64)
    base.lengthscale = 0.2
    with gp.settings.lazily_evaluate_kernels(False):
        K_exact = np.asarray(base(x, x).to_dense())
    assert np.max(np.abs(K_ski - K_exact)) < 1e-3


def test_posterior_fully_jittable_with_traced_train_data():
    """The WHOLE eval path (mean-cache CG solve + LOVE root + test block) must trace
    under jit with train data as traced arguments — the production-serving pattern
    (compile once, evaluate many test batches at cached speed).  Regression: the
    differentiable-solve tolerance used to be a traced operand compared with `<`
    at trace time (TracerBoolConversionError)."""
    import gpytorch_tpu as gp
    from gpytorch_tpu.distributions import MultivariateNormal
    from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
    from gpytorch_tpu.likelihoods import GaussianLikelihood
    from gpytorch_tpu.means import ConstantMean
    from gpytorch_tpu.models import ExactGP

    class M(ExactGP):
        def __init__(s, a, b, lik):
            super().__init__(a, b, lik)
            s.mean_module = ConstantMean()
            s.covar_module = ScaleKernel(RBFKernel())

        def forward(s, xx):
            return MultivariateNormal(s.mean_module(xx), s.covar_module(xx))

    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.uniform(kx, (400, 1), dtype=jnp.float32)
    y = jnp.sin(6 * x[:, 0]) + 0.05 * jax.random.normal(ky, (400,), dtype=jnp.float32)
    tx = jnp.linspace(0.0, 1.0, 64)[:, None].astype(jnp.float32)

    @jax.jit
    def posterior(x_, y_, tx_):
        m = M(x_, y_, GaussianLikelihood()).eval()
        with gp.settings.max_cholesky_size(0), gp.settings.eval_cg_tolerance(1e-6), \
             gp.settings.fast_pred_var(True), gp.settings.max_root_decomposition_size(64):
            pred = m(tx_)
            return pred.mean, pred.variance

    mean, var = posterior(x, y, tx)
    # vs the dense-Cholesky eager path
    m2 = M(x, y, GaussianLikelihood()).eval()
    pred2 = m2(tx)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(pred2.mean), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var), np.asarray(pred2.variance), rtol=5e-2, atol=1e-4)
