"""Bayesian GPLVM: unsupervised latent-space recovery from high-dimensional observations.

Reference workflow: gpytorch/models/gplvm/bayesian_gplvm.py:8 +
examples/045_GPLVM (the GPLVM tutorial) — a batch of independent GPs (one per observed
data dimension) maps a LEARNED low-dimensional latent input X to the observations Y.
The latent variable is variational (q(X) = N(mu, s)), regularized toward a standard-
normal prior through a KLGaussianAddedLossTerm that the ELBO picks up automatically.

TPU notes: the per-data-dimension GPs are a leading batch axis (batch_shape=(data_dim,))
— XLA vectorizes the whole model over it; one jitted Adam step trains latents, inducing
points, kernel hypers, and the likelihood jointly.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.mlls import VariationalELBO
from gpytorch_tpu.models import BayesianGPLVM, VariationalLatentVariable
from gpytorch_tpu.priors import NormalPrior
from gpytorch_tpu.variational import CholeskyVariationalDistribution, VariationalStrategy


def make_data(n, data_dim, latent_dim):
    """Nonlinear lift of a 2-d latent into data_dim observations."""
    X_true = jax.random.normal(jax.random.PRNGKey(0), (n, latent_dim))
    W = 0.6 * jax.random.normal(jax.random.PRNGKey(1), (latent_dim, data_dim))
    lin = X_true @ W
    Y = lin + 0.4 * jnp.sin(2.0 * lin) + 0.05 * jax.random.normal(jax.random.PRNGKey(2), (n, data_dim))
    return X_true, Y


def pca_init(Y, k):
    Yc = Y - jnp.mean(Y, 0)
    _, _, Vt = jnp.linalg.svd(Yc, full_matrices=False)
    X0 = Yc @ Vt[:k].T
    return X0 / jnp.std(X0, axis=0, keepdims=True)


class GPLVM(BayesianGPLVM):
    def __init__(self, X_init, n, data_dim, latent_dim, m_inducing):
        # q(X): learned variational latent positions with a N(0, I) prior
        prior_x = NormalPrior(jnp.zeros((n, latent_dim)), jnp.ones((n, latent_dim)))
        latent = VariationalLatentVariable(n, data_dim, latent_dim, X_init, prior_x)
        Z = jax.random.normal(jax.random.PRNGKey(3), (data_dim, m_inducing, latent_dim))
        vd = CholeskyVariationalDistribution(m_inducing, batch_shape=(data_dim,))
        strategy = VariationalStrategy(self, Z, vd, learn_inducing_locations=True, jitter_val=1e-4)
        super().__init__(latent, strategy)
        self.mean_module = gp.means.ConstantMean(batch_shape=(data_dim,))
        self.covar_module = ScaleKernel(
            RBFKernel(ard_num_dims=latent_dim, batch_shape=(data_dim,)), batch_shape=(data_dim,)
        )

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def main(quick: bool = False):
    n, data_dim, latent_dim, m = (48, 6, 2, 12) if quick else (96, 8, 2, 16)
    iters = 120 if quick else 400
    X_true, Y = make_data(n, data_dim, latent_dim)
    model = GPLVM(pca_init(Y, latent_dim), n, data_dim, latent_dim, m)
    lik = GaussianLikelihood(batch_shape=(data_dim,))
    _ = model(model.sample_latent_variable())  # eager shape init

    params = {**{f"m.{k}": v for k, v in model.trainable_params().items()},
              **{f"l.{k}": v for k, v in lik.trainable_params().items()}}
    opt = optax.adam(0.05)
    state = opt.init(params)
    Yt = Y.T  # (data_dim, n): one GP per observed dimension

    @jax.jit
    def step(p, s, key):
        def loss_fn(p):
            m_ = model.with_params({k[2:]: v for k, v in p.items() if k.startswith("m.")})
            l_ = lik.with_params({k[2:]: v for k, v in p.items() if k.startswith("l.")})
            x = m_.sample_latent_variable(key)  # reparameterized draw from q(X)
            # ELBO + the latent KL added-loss term (KLGaussianAddedLossTerm)
            elbo = VariationalELBO(l_, m_, num_data=n)(m_(x), Yt)
            return -jnp.sum(elbo)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    key = jax.random.PRNGKey(10)
    for i in range(iters):
        key, sub = jax.random.split(key)
        params, state, loss = step(params, state, sub)
        if not quick and i % 100 == 0:
            print(f"iter {i:4d}  -elbo = {float(loss):.3f}")

    model = model.with_params({k[2:]: v for k, v in params.items() if k.startswith("m.")})
    # The learned latent mean should recover X_true up to a linear map (rotation/scale):
    # regress X_true on X_learned and measure R^2.
    X_learned = model.X.q_mu
    A, *_ = jnp.linalg.lstsq(
        jnp.concatenate([X_learned, jnp.ones((n, 1))], 1), X_true, rcond=None
    )
    X_rec = jnp.concatenate([X_learned, jnp.ones((n, 1))], 1) @ A
    r2 = 1.0 - float(jnp.sum((X_rec - X_true) ** 2) / jnp.sum((X_true - X_true.mean(0)) ** 2))
    print(f"latent recovery R^2 (up to linear map): {r2:.3f}")
    assert r2 > 0.5, r2
    return r2


if __name__ == "__main__":
    main()
