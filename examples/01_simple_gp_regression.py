"""Simple exact-GP regression (reference: examples/01_Exact_GPs/Simple_GP_Regression.ipynb).

Trains an RBF exact GP on noisy sine data with Adam and prints the test MAE and NLPD.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import jax.numpy as jnp
import optax

from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.metrics import mean_absolute_error, negative_log_predictive_density
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
from gpytorch_tpu.models import ExactGP


class GPModel(ExactGP):
    def __init__(self, train_x, train_y, likelihood):
        super().__init__(train_x, train_y, likelihood)
        self.mean_module = ConstantMean()
        self.covar_module = ScaleKernel(RBFKernel())

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def main():
    train_x = jnp.linspace(0, 1, 100)
    train_y = jnp.sin(train_x * 2 * jnp.pi) + 0.1 * jax.random.normal(jax.random.PRNGKey(0), (100,))

    model = GPModel(train_x, train_y, GaussianLikelihood())
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

    for i in range(75):
        params, state, loss = step(params, state)
        if i % 25 == 0:
            print(f"iter {i:3d}  loss {float(loss):.3f}")

    model = model.with_params(params).eval()
    test_x = jnp.linspace(0.02, 0.98, 51)
    test_y = jnp.sin(test_x * 2 * jnp.pi)
    pred = model.likelihood(model(test_x))
    print("lengthscale:", float(jnp.reshape(model.covar_module.base_kernel.lengthscale, (-1,))[0]))
    print("noise:      ", float(jnp.reshape(model.likelihood.noise, (-1,))[0]))
    print("test MAE:   ", float(mean_absolute_error(pred, test_y)))
    print("test NLPD:  ", float(negative_log_predictive_density(pred, test_y)))


if __name__ == "__main__":
    main()
