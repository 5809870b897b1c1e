"""Bayesian GPLVM end-to-end: recover a 2-d latent space from high-dimensional
observations (reference: gpytorch/models/gplvm/* + the GPLVM tutorial setup)."""

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
from gpytorch_tpu.models import (
    BayesianGPLVM,
    MAPLatentVariable,
    PointLatentVariable,
    VariationalLatentVariable,
)
from gpytorch_tpu.priors import NormalPrior
from gpytorch_tpu.variational import CholeskyVariationalDistribution, VariationalStrategy

N, DATA_DIM, LATENT_DIM, M = 48, 6, 2, 12


def _make_data():
    key = jax.random.PRNGKey(0)
    X_true = jax.random.normal(key, (N, LATENT_DIM))
    W = 0.6 * jax.random.normal(jax.random.PRNGKey(1), (LATENT_DIM, DATA_DIM))
    lin = X_true @ W
    Y = lin + 0.4 * jnp.sin(2.0 * lin) + 0.05 * jax.random.normal(jax.random.PRNGKey(2), (N, DATA_DIM))
    return X_true, Y


class _GPLVM(BayesianGPLVM):
    def __init__(self, latent):
        Z = jax.random.normal(jax.random.PRNGKey(3), (DATA_DIM, M, LATENT_DIM))
        vd = CholeskyVariationalDistribution(M, batch_shape=(DATA_DIM,))
        strategy = VariationalStrategy(self, Z, vd, learn_inducing_locations=True, jitter_val=1e-4)
        super().__init__(latent, strategy)
        self.mean_module = gp.means.ConstantMean(batch_shape=(DATA_DIM,))
        self.covar_module = ScaleKernel(
            RBFKernel(ard_num_dims=LATENT_DIM, batch_shape=(DATA_DIM,)), batch_shape=(DATA_DIM,)
        )

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def _pca_init(Y, k):
    Yc = Y - jnp.mean(Y, 0)
    _, _, Vt = jnp.linalg.svd(Yc, full_matrices=False)
    X0 = Yc @ Vt[:k].T
    return X0 / jnp.std(X0, axis=0, keepdims=True)


def _train(model, lik, Y, iters=200, lr=0.05):
    _ = model(model.sample_latent_variable())  # eager init
    params = {**{f"m.{k}": v for k, v in model.trainable_params().items()},
              **{f"l.{k}": v for k, v in lik.trainable_params().items()}}
    opt = optax.adam(lr)
    state = opt.init(params)
    Yt = Y.T  # (data_dim, n)

    @jax.jit
    def step(p, s, key):
        def loss_fn(p):
            m = model.with_params({k[2:]: v for k, v in p.items() if k.startswith("m.")})
            l = lik.with_params({k[2:]: v for k, v in p.items() if k.startswith("l.")})
            x = m.sample_latent_variable(key)
            elbo = VariationalELBO(l, m, num_data=N)(m(x), Yt)
            return -jnp.sum(elbo)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    key = jax.random.PRNGKey(10)
    for _ in range(iters):
        key, sub = jax.random.split(key)
        params, state, loss = step(params, state, sub)
    return model.with_params({k[2:]: v for k, v in params.items() if k.startswith("m.")}), float(loss)


def _distance_corr(A, B):
    """Correlation between pairwise-distance matrices (latent recovery is only defined up
    to rotation/scale, so compare geometry)."""
    dA = np.linalg.norm(np.asarray(A)[:, None] - np.asarray(A)[None], axis=-1).ravel()
    dB = np.linalg.norm(np.asarray(B)[:, None] - np.asarray(B)[None], axis=-1).ravel()
    return np.corrcoef(dA, dB)[0, 1]


def test_gplvm_variational_recovers_latent_geometry():
    X_true, Y = _make_data()
    prior_x = NormalPrior(jnp.zeros((N, LATENT_DIM)), jnp.ones((N, LATENT_DIM)))
    latent = VariationalLatentVariable(N, DATA_DIM, LATENT_DIM, _pca_init(Y, LATENT_DIM), prior_x)
    model = _GPLVM(latent)
    lik = GaussianLikelihood(batch_shape=(DATA_DIM,))
    model, loss = _train(model, lik, Y, iters=300)
    assert np.isfinite(loss)
    corr = _distance_corr(model.X.q_mu, X_true)
    assert corr > 0.5, f"latent geometry correlation {corr:.3f}"


def test_gplvm_point_and_map_latents():
    X_true, Y = _make_data()
    X_init = _pca_init(Y, LATENT_DIM)
    for latent in [
        PointLatentVariable(N, LATENT_DIM, X_init),
        MAPLatentVariable(N, LATENT_DIM, X_init, gp.priors.NormalPrior(0.0, 1.0)),
    ]:
        model = _GPLVM(latent)
        lik = GaussianLikelihood(batch_shape=(DATA_DIM,))
        model, loss = _train(model, lik, Y, iters=100)
        assert np.isfinite(loss)
        corr = _distance_corr(model.X.X, X_true)
        assert corr > 0.4, f"{type(latent).__name__} latent corr {corr:.3f}"
