"""Deep kernel learning: neural feature extractor + SKI GP
(reference: examples/06_PyTorch_NN_Integration_DKL/KISSGP_Deep_Kernel_Regression_CUDA.ipynb).

The feature extractor is an ordinary Module with registered parameters — the whole model
(NN weights + GP hyperparameters) is one pytree trained jointly under one jit.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import jax.numpy as jnp
import optax

from gpytorch_tpu.core.module import Module
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import GridInterpolationKernel, RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
from gpytorch_tpu.models import ExactGP


class FeatureExtractor(Module):
    """2-layer MLP; tanh output keeps features inside the fixed SKI grid bounds."""

    def __init__(self, key, in_dim=2, hidden=32, out_dim=1):
        super().__init__()
        k1, k2 = jax.random.split(key)
        self.register_parameter("w1", jax.random.normal(k1, (in_dim, hidden)) / jnp.sqrt(in_dim))
        self.register_parameter("b1", jnp.zeros((hidden,)))
        self.register_parameter("w2", jax.random.normal(k2, (hidden, out_dim)) / jnp.sqrt(hidden))
        self.register_parameter("b2", jnp.zeros((out_dim,)))

    def forward(self, x):
        h = jax.nn.relu(x @ self.w1 + self.b1)
        return jnp.tanh(h @ self.w2 + self.b2)


class DKLModel(ExactGP):
    def __init__(self, train_x, train_y, likelihood):
        super().__init__(train_x, train_y, likelihood)
        self.feature_extractor = FeatureExtractor(jax.random.PRNGKey(0))
        self.mean_module = ConstantMean()
        self.covar_module = GridInterpolationKernel(
            ScaleKernel(RBFKernel()), grid_size=64, num_dims=1, grid_bounds=[(-1.1, 1.1)]
        )

    def forward(self, x):
        feat = self.feature_extractor(x)
        return MultivariateNormal(self.mean_module(feat), self.covar_module(feat))


def main():
    n = 256
    key = jax.random.PRNGKey(42)
    train_x = jax.random.uniform(key, (n, 2))
    train_y = jnp.sin((train_x[:, 0] + train_x[:, 1]) * 2 * jnp.pi)  # depends on x0+x1 only

    model = DKLModel(train_x, train_y, GaussianLikelihood())
    params = model.trainable_params()
    opt = optax.adam(0.05)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m = model.with_params(p)
            return -ExactMarginalLogLikelihood(m.likelihood, m)(m(train_x), train_y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    for i in range(100):
        params, state, loss = step(params, state)
        if i % 25 == 0:
            print(f"iter {i:3d}  loss {float(loss):.3f}")

    model = model.with_params(params).eval()
    test_x = jax.random.uniform(jax.random.PRNGKey(7), (100, 2))
    test_y = jnp.sin((test_x[:, 0] + test_x[:, 1]) * 2 * jnp.pi)
    pred = model.likelihood(model(test_x))
    print("test MAE:", float(jnp.mean(jnp.abs(pred.mean - test_y))))


if __name__ == "__main__":
    main()
