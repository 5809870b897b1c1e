"""Stochastic variational GP classification with NGD
(reference: examples/04_Variational_and_Approximate_GPs/SVGP_Regression_CUDA.ipynb and
Natural_Gradient_Descent.ipynb, adapted to Bernoulli classification).

The variational distribution uses natural coordinates; SGD on them (optim.ngd) IS natural
gradient descent thanks to the custom-VJP gradient surgery. Hyperparameters take Adam.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import jax.numpy as jnp
import optax

from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import BernoulliLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.mlls import VariationalELBO
from gpytorch_tpu.models import ApproximateGP
from gpytorch_tpu.optim import ngd
from gpytorch_tpu.variational import NaturalVariationalDistribution, VariationalStrategy


class SVGPClassifier(ApproximateGP):
    def __init__(self, inducing_points):
        dist = NaturalVariationalDistribution(inducing_points.shape[0])
        strategy = VariationalStrategy(self, inducing_points, dist, learn_inducing_locations=True)
        super().__init__(strategy)
        self.mean_module = ConstantMean()
        self.covar_module = ScaleKernel(RBFKernel())

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def main():
    n = 256
    key = jax.random.PRNGKey(0)
    train_x = jax.random.uniform(key, (n, 1))
    train_y = (jnp.sin(train_x[:, 0] * 4 * jnp.pi) > 0).astype(jnp.float32)

    model = SVGPClassifier(jnp.linspace(0, 1, 24)[:, None])
    lik = BernoulliLikelihood()
    _ = model(train_x[:4])  # initialize variational parameters eagerly

    # split parameters: natural variational params get NGD, everything else Adam
    params = {**{f"m.{k}": v for k, v in model.trainable_params().items()},
              **{f"l.{k}": v for k, v in lik.trainable_params().items()}}
    is_natural = lambda name: "natural_" in name
    opt = optax.multi_transform(
        {"ngd": ngd(0.1, num_data=n), "adam": optax.adam(0.05)},
        {k: ("ngd" if is_natural(k) else "adam") for k in params},
    )
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m = model.with_params({k[2:]: v for k, v in p.items() if k.startswith("m.")})
            l = lik.with_params({k[2:]: v for k, v in p.items() if k.startswith("l.")})
            return -VariationalELBO(l, m, num_data=n)(m(train_x), train_y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    for i in range(200):
        params, state, loss = step(params, state)
        if i % 50 == 0:
            print(f"iter {i:3d}  -ELBO {float(loss):.3f}")

    model = model.with_params({k[2:]: v for k, v in params.items() if k.startswith("m.")}).eval()
    probs = lik(model(train_x)).probs
    acc = float(jnp.mean(((probs > 0.5).astype(jnp.float32) == train_y).astype(jnp.float32)))
    print("train accuracy:", acc)


if __name__ == "__main__":
    main()
