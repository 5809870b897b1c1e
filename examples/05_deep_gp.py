"""Two-layer Deep GP (reference: examples/05_Deep_Gaussian_Processes/Deep_Gaussian_Processes.ipynb).

Each layer is an SVGP; hidden-layer outputs are sampled and propagated, the MLL averages
over the sample dimension and sums KL over layers (DeepApproximateMLL).
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
from gpytorch_tpu.means import ConstantMean, LinearMean
from gpytorch_tpu.mlls import DeepApproximateMLL, VariationalELBO
from gpytorch_tpu.models import DeepGP, DeepGPLayer
from gpytorch_tpu.variational import CholeskyVariationalDistribution, VariationalStrategy


def make_layer(model, input_dims, output_dims, num_inducing=24, mean_type="linear"):
    batch = () if output_dims is None else (output_dims,)
    inducing = jax.random.uniform(jax.random.PRNGKey(0), batch + (num_inducing, input_dims))
    dist = CholeskyVariationalDistribution(num_inducing, batch_shape=batch)

    class Layer(DeepGPLayer):
        def __init__(self):
            strategy = VariationalStrategy(self, inducing, dist, learn_inducing_locations=True)
            super().__init__(strategy, input_dims, output_dims)
            self.mean_module = LinearMean(input_dims) if mean_type == "linear" else ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel(ard_num_dims=input_dims, batch_shape=batch),
                                            batch_shape=batch)

        def forward(self, x):
            return MultivariateNormal(self.mean_module(x), self.covar_module(x))

    return Layer()


class TwoLayerDeepGP(DeepGP):
    def __init__(self):
        super().__init__()
        self.hidden = make_layer(self, input_dims=1, output_dims=2)
        self.out = make_layer(self, input_dims=2, output_dims=None, mean_type="constant")
        self.likelihood = GaussianLikelihood()

    def forward(self, x, key=None):
        h = self.hidden(x, key=key)
        return self.out(h, key=key)


def main():
    n = 128
    train_x = jnp.linspace(0, 1, n)[:, None]
    train_y = jnp.sin(train_x[:, 0] * 2 * jnp.pi) * jnp.sign(train_x[:, 0] - 0.5)

    model = TwoLayerDeepGP()
    _ = model(train_x[:4], key=jax.random.PRNGKey(0))
    params = model.trainable_params()
    opt = optax.adam(0.05)
    state = opt.init(params)
    mkey = jax.random.PRNGKey(1)

    @jax.jit
    def step(p, s, k):
        def loss_fn(p):
            m = model.with_params(p)
            mll = DeepApproximateMLL(VariationalELBO(m.likelihood, m, num_data=n))
            return -mll(m(train_x, key=k), train_y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    for i in range(150):
        mkey, sub = jax.random.split(mkey)
        params, state, loss = step(params, state, sub)
        if i % 50 == 0:
            print(f"iter {i:3d}  -ELBO {float(loss):.3f}")

    model = model.with_params(params).eval()
    pred = model(train_x, key=jax.random.PRNGKey(2))
    mean = jnp.mean(pred.mean, axis=0)  # average over likelihood samples
    print("train MAE:", float(jnp.mean(jnp.abs(mean - train_y))))


if __name__ == "__main__":
    main()
