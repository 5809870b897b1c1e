"""Multitask exact GP with a Kronecker task covariance
(reference: examples/03_Multitask_Exact_GPs/Multitask_GP_Regression.ipynb).

K((x,i),(x',j)) = K_data(x,x') · K_task[i,j]; the full covariance is a lazy Kronecker
operator and solves stay structured (never densified to (nt × nt)).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import jax.numpy as jnp
import optax

from gpytorch_tpu.distributions import MultitaskMultivariateNormal
from gpytorch_tpu.kernels import MultitaskKernel, RBFKernel
from gpytorch_tpu.likelihoods import MultitaskGaussianLikelihood
from gpytorch_tpu.means import ConstantMean, MultitaskMean
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
from gpytorch_tpu.models import ExactGP


class MultitaskGPModel(ExactGP):
    def __init__(self, train_x, train_y, likelihood):
        super().__init__(train_x, train_y, likelihood)
        self.mean_module = MultitaskMean(ConstantMean(), num_tasks=2)
        self.covar_module = MultitaskKernel(RBFKernel(), num_tasks=2, rank=1)

    def forward(self, x):
        return MultitaskMultivariateNormal(self.mean_module(x), self.covar_module(x))


def main():
    n = 100
    train_x = jnp.linspace(0, 1, n)
    train_y = jnp.stack(
        [jnp.sin(train_x * 2 * jnp.pi), jnp.cos(train_x * 2 * jnp.pi)], axis=-1
    ) + 0.05 * jax.random.normal(jax.random.PRNGKey(0), (n, 2))

    model = MultitaskGPModel(train_x, train_y, MultitaskGaussianLikelihood(num_tasks=2))
    params = model.trainable_params()
    opt = optax.adam(0.1)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m = model.with_params(p)
            return -ExactMarginalLogLikelihood(m.likelihood, m)(m(train_x), train_y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    for _ in range(60):
        params, state, loss = step(params, state)
    print("final loss:", float(loss))

    model = model.with_params(params).eval()
    test_x = jnp.linspace(0.02, 0.98, 51)
    truth = jnp.stack([jnp.sin(test_x * 2 * jnp.pi), jnp.cos(test_x * 2 * jnp.pi)], axis=-1)
    pred = model.likelihood(model(test_x))
    print("per-task MAE:", [float(v) for v in jnp.mean(jnp.abs(pred.mean - truth), axis=0)])


if __name__ == "__main__":
    main()
