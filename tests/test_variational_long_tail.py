"""Long-tail variational strategies (reference test/variational/*): CIQ, grid
interpolation (+additive), orthogonally/batch-decoupled, large-batch, and VNNGP each train
on the SVGP sine toy and hit the reference accuracy gate (MAE < 0.1,
test/examples/test_svgp_gp_regression.py:69-70)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.mlls import VariationalELBO
from gpytorch_tpu.models import ApproximateGP
from gpytorch_tpu.utils.nearest_neighbors import NNUtil
from gpytorch_tpu.variational import (
    AdditiveGridInterpolationVariationalStrategy,
    BatchDecoupledVariationalStrategy,
    CholeskyVariationalDistribution,
    CiqVariationalStrategy,
    DeltaVariationalDistribution,
    GridInterpolationVariationalStrategy,
    LargeBatchVariationalStrategy,
    MeanFieldVariationalDistribution,
    NNVariationalStrategy,
    OrthogonallyDecoupledVariationalStrategy,
    VariationalStrategy,
)


def _data(n=256):
    key = jax.random.PRNGKey(0)
    train_x = jnp.linspace(0, 1, n)
    train_y = jnp.sin(train_x * 2 * jnp.pi) + 0.1 * jax.random.normal(key, (n,))
    test_x = jnp.linspace(0.02, 0.98, 25)
    test_y = jnp.sin(test_x * 2 * jnp.pi)
    return train_x, train_y, test_x, test_y


class _Model(ApproximateGP):
    def __init__(self, strategy_factory):
        strategy = strategy_factory(self)
        super().__init__(strategy)
        self.mean_module = gp.means.ConstantMean()
        self.covar_module = ScaleKernel(RBFKernel())

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def _train(model, lik, train_x, train_y, iters=150, lr=0.05, **mll_kwargs):
    _ = model(train_x[:4])  # eager init of variational params
    params = {**{f"m.{k}": v for k, v in model.trainable_params().items()},
              **{f"l.{k}": v for k, v in lik.trainable_params().items()}}
    opt = optax.adam(lr)
    state = opt.init(params)
    num_data = train_y.shape[0]

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m = model.with_params({k[2:]: v for k, v in p.items() if k.startswith("m.")})
            l = lik.with_params({k[2:]: v for k, v in p.items() if k.startswith("l.")})
            return -VariationalELBO(l, m, num_data=num_data, **mll_kwargs)(m(train_x), train_y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    for _ in range(iters):
        params, state, loss = step(params, state)
    model = model.with_params({k[2:]: v for k, v in params.items() if k.startswith("m.")})
    lik = lik.with_params({k[2:]: v for k, v in params.items() if k.startswith("l.")})
    return model, lik, float(loss)


def _mae(model, lik, test_x, test_y):
    model.eval()
    preds = lik(model(test_x))
    return float(jnp.mean(jnp.abs(preds.mean - test_y)))


def test_ciq_strategy():
    train_x, train_y, test_x, test_y = _data()
    Z = jnp.linspace(0, 1, 25)[:, None]
    model = _Model(lambda m: CiqVariationalStrategy(
        m, Z, CholeskyVariationalDistribution(25), learn_inducing_locations=True, jitter_val=1e-4))
    lik = GaussianLikelihood()
    model, lik, _ = _train(model, lik, train_x, train_y)
    assert _mae(model, lik, test_x, test_y) < 0.1


def test_large_batch_strategy():
    train_x, train_y, test_x, test_y = _data()
    Z = jnp.linspace(0, 1, 25)[:, None]
    model = _Model(lambda m: LargeBatchVariationalStrategy(
        m, Z, CholeskyVariationalDistribution(25), learn_inducing_locations=True, jitter_val=1e-4))
    lik = GaussianLikelihood()
    model, lik, _ = _train(model, lik, train_x, train_y)
    assert _mae(model, lik, test_x, test_y) < 0.1


def test_grid_interpolation_strategy():
    train_x, train_y, test_x, test_y = _data()
    model = _Model(lambda m: GridInterpolationVariationalStrategy(
        m, grid_size=64, grid_bounds=[(0.0, 1.0)],
        variational_distribution=CholeskyVariationalDistribution(64)))
    lik = GaussianLikelihood()
    model, lik, _ = _train(model, lik, train_x, train_y)
    assert _mae(model, lik, test_x, test_y) < 0.1


def test_additive_grid_interpolation_strategy():
    # 2-d additive toy: y = sin(2πx₁) + cos(2πx₂)
    key = jax.random.PRNGKey(1)
    n = 256
    x = jax.random.uniform(key, (n, 2))
    y = jnp.sin(2 * jnp.pi * x[:, 0]) + jnp.cos(2 * jnp.pi * x[:, 1]) + 0.05 * jax.random.normal(key, (n,))
    test_x = jax.random.uniform(jax.random.PRNGKey(2), (32, 2), minval=0.05, maxval=0.95)
    test_y = jnp.sin(2 * jnp.pi * test_x[:, 0]) + jnp.cos(2 * jnp.pi * test_x[:, 1])
    model = _Model(lambda m: AdditiveGridInterpolationVariationalStrategy(
        m, grid_size=32, grid_bounds=[(0.0, 1.0)], num_dim=2,
        variational_distribution=CholeskyVariationalDistribution(32, batch_shape=(2,))))
    lik = GaussianLikelihood()
    model, lik, _ = _train(model, lik, x, y, iters=200)
    assert _mae(model, lik, test_x, test_y) < 0.15


def test_orthogonally_decoupled_strategy():
    train_x, train_y, test_x, test_y = _data()
    Z_covar = jnp.linspace(0, 1, 15)[:, None]
    Z_mean = jnp.linspace(0, 1, 50)[:, None]

    def factory(m):
        covar_strategy = VariationalStrategy(
            m, Z_covar, CholeskyVariationalDistribution(15), learn_inducing_locations=True, jitter_val=1e-4)
        return OrthogonallyDecoupledVariationalStrategy(
            covar_strategy, Z_mean, DeltaVariationalDistribution(50))

    model = _Model(factory)
    lik = GaussianLikelihood()
    model, lik, _ = _train(model, lik, train_x, train_y)
    assert _mae(model, lik, test_x, test_y) < 0.1


def test_batch_decoupled_strategy():
    train_x, train_y, test_x, test_y = _data()
    Z = jnp.linspace(0, 1, 25)[:, None]
    model = _Model(lambda m: BatchDecoupledVariationalStrategy(
        m, Z, CholeskyVariationalDistribution(25), learn_inducing_locations=True, jitter_val=1e-4))
    lik = GaussianLikelihood()
    model, lik, _ = _train(model, lik, train_x, train_y)
    assert _mae(model, lik, test_x, test_y) < 0.1


def test_vnngp_strategy():
    train_x, train_y, test_x, test_y = _data(n=128)
    model = _Model(lambda m: NNVariationalStrategy(
        m, train_x[:, None], MeanFieldVariationalDistribution(128), k=16, compute_full_kl=True))
    lik = GaussianLikelihood()
    model, lik, _ = _train(model, lik, train_x, train_y, iters=250, lr=0.1)
    assert _mae(model, lik, test_x, test_y) < 0.15


def test_vnngp_stochastic_kl_unbiased_shape():
    train_x, train_y, *_ = _data(n=64)
    model = _Model(lambda m: NNVariationalStrategy(
        m, train_x[:, None], MeanFieldVariationalDistribution(64), k=8))
    _ = model(train_x[:4])
    strat = model.variational_strategy
    full = float(strat.kl_divergence(model=model))
    sto = float(strat.kl_divergence(model=model, kl_indices=jnp.arange(8, 64)))
    # with the full index set the stochastic estimator IS the full KL
    np.testing.assert_allclose(sto, full, rtol=1e-5)
    assert full >= -1e-5


def test_nn_util_find_and_sequential():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (50, 3))
    util = NNUtil(k=4, dim=3)
    util.set_nn_idx(x)
    idx = util.find_nn_idx(x[:5])
    assert idx.shape == (5, 4)
    # nearest neighbor of a train point is itself
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), np.arange(5))
    seq = util.build_sequential_nn_idx(x)
    assert seq.shape == (46, 4)
    seq_np = np.asarray(seq)
    for i in range(46):
        assert (seq_np[i] < i + 4).all(), "sequential neighbors must precede the point"
        # verify against brute force
        d2 = ((np.asarray(x)[i + 4] - np.asarray(x)[: i + 4]) ** 2).sum(-1)
        expected = set(np.argsort(d2)[:4].tolist())
        assert set(seq_np[i].tolist()) == expected


def test_ivf_nn_util_recall_and_shapes():
    # IVF (faiss-analogue) approximate k-NN: high recall vs the exact path on clustered
    # and uniform data (reference prefers faiss at scale: gpytorch/utils/nearest_neighbors.py:35)
    from gpytorch_tpu.utils.nearest_neighbors import IVFNNUtil

    rng = np.random.RandomState(0)
    n, d, k = 3000, 3, 8
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    q = jnp.asarray(rng.randn(128, d).astype(np.float32))

    exact = NNUtil(k, d)
    exact.set_nn_idx(x)
    ivf = IVFNNUtil(k, d, nprobe=8)
    ivf.set_nn_idx(x)

    ei = np.asarray(exact.find_nn_idx(q))
    ai = np.asarray(ivf.find_nn_idx(q))
    assert ai.shape == (128, k)
    assert ai.min() >= 0 and ai.max() < n
    recall = np.mean([len(set(ei[i]) & set(ai[i])) / k for i in range(q.shape[0])])
    assert recall >= 0.95, f"IVF recall too low: {recall}"

    # single-query convenience path and k override
    one = np.asarray(ivf.find_nn_idx(q[0], k=4))
    assert one.shape == (4,)
    assert set(one.tolist()) <= set(ei[0].tolist()) | set(ai[0].tolist()) | set(range(n))

    # a train point's own nearest neighbor is itself (clusters contain their members)
    self_idx = np.asarray(ivf.find_nn_idx(x[:16]))
    assert (self_idx[:, 0] == np.arange(16)).mean() >= 0.95
