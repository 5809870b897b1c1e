"""CIQ-SVGP with natural-gradient descent: whitening without a Cholesky of K_ZZ.

Reference workflow: gpytorch/variational/ciq_variational_strategy.py:128 +
examples/04_Variational_and_Approximate_GPs/SVGP_CIQ.ipynb — contour-integral
quadrature (msMINRES) applies K_ZZ^{-1/2} as a few shifted solves, so the whitened
update never factorizes K_ZZ.  This matters at large inducing counts (m in the
thousands): Cholesky is O(m^3) serial, CIQ is a handful of matmul-bound Krylov solves.
CIQ pairs with NaturalVariationalDistribution + NGD (the reference recommends it:
ELBO terms are computed directly in the natural parameterization).

TPU notes: the msMINRES shifts are traced elliptic-integral nodes (solvers/contour.py),
everything stays inside one jit; the optimizer is optax.multi_transform with NGD on the
natural parameters and Adam on kernel/likelihood hypers.
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
from gpytorch_tpu.mlls import VariationalELBO
from gpytorch_tpu.models import ApproximateGP
from gpytorch_tpu.optim import ngd
from gpytorch_tpu.variational import CiqVariationalStrategy, NaturalVariationalDistribution


class CiqSVGP(ApproximateGP):
    def __init__(self, inducing_points):
        m = inducing_points.shape[0]
        vd = NaturalVariationalDistribution(m)
        strategy = CiqVariationalStrategy(
            self, inducing_points, vd, learn_inducing_locations=True, jitter_val=1e-4
        )
        super().__init__(strategy)
        self.mean_module = ConstantMean()
        self.covar_module = ScaleKernel(RBFKernel())

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def main(quick: bool = False):
    n, m, iters = (256, 25, 150) if quick else (2048, 64, 300)
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    train_x = jax.random.uniform(kx, (n,))
    train_y = jnp.sin(train_x * 2 * jnp.pi) + 0.15 * jax.random.normal(ky, (n,))
    test_x = jnp.linspace(0.02, 0.98, 64)
    test_y = jnp.sin(test_x * 2 * jnp.pi)

    model = CiqSVGP(jnp.linspace(0, 1, m)[:, None])
    lik = GaussianLikelihood()
    _ = model(train_x[:4])  # eager init of the variational distribution

    params = {**{f"m.{k}": v for k, v in model.trainable_params().items()},
              **{f"l.{k}": v for k, v in lik.trainable_params().items()}}
    is_natural = lambda k: "_variational_distribution.natural" in k
    labels = {k: ("ngd" if is_natural(k) else "adam") for k in params}
    opt = optax.multi_transform({"ngd": ngd(0.05, n), "adam": optax.adam(0.05)}, labels)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m_ = model.with_params({k[2:]: v for k, v in p.items() if k.startswith("m.")})
            l_ = lik.with_params({k[2:]: v for k, v in p.items() if k.startswith("l.")})
            return -VariationalELBO(l_, m_, num_data=n)(m_(train_x), train_y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    for i in range(iters):
        params, state, loss = step(params, state)
        if not quick and i % 50 == 0:
            print(f"iter {i:4d}  -elbo/n = {float(loss):.4f}")

    model = model.with_params({k[2:]: v for k, v in params.items() if k.startswith("m.")})
    lik = lik.with_params({k[2:]: v for k, v in params.items() if k.startswith("l.")})
    model.eval()
    pred = lik(model(test_x))
    mae = float(jnp.mean(jnp.abs(pred.mean - test_y)))
    print(f"CIQ-SVGP test MAE: {mae:.4f}")
    assert mae < 0.1, mae
    return mae


if __name__ == "__main__":
    main()
