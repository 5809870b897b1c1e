"""VNNGP at scale: nearest-neighbor variational GP with an IVF approximate k-NN index.

Reference workflow: gpytorch/variational/nearest_neighbor_variational_strategy.py:24
(VNNGP, Wu et al. 2022) + examples/04_Variational_and_Approximate_GPs/VNNGP.ipynb —
every data point is its own inducing point, sparsified to its k nearest neighbors, so
the per-minibatch cost is O(b·k³) independent of N.  The reference shells out to faiss
for the k-NN structure at scale; the TPU-native analogue is the IVF inverted-file index
(``preferred_nnlib="ivf"``): k-means buckets assigned by MXU matmuls, nprobe-bucket
candidate search, and an IVF-accelerated *sequential* build that replaces the O(N²)
setup with O(N·nprobe·N/C).

Run without arguments for the N=50,000 configuration (a few minutes on CPU; the k-NN
setup itself is seconds).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import MaternKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.mlls import VariationalELBO
from gpytorch_tpu.models import ApproximateGP
from gpytorch_tpu.variational import MeanFieldVariationalDistribution, NNVariationalStrategy


class VNNGP(ApproximateGP):
    def __init__(self, inducing_points, k, batch_size):
        m = inducing_points.shape[0]
        vd = MeanFieldVariationalDistribution(m)
        strategy = NNVariationalStrategy(
            self, inducing_points, vd, k=k, training_batch_size=batch_size,
            jitter_val=1e-4, preferred_nnlib="ivf",
        )
        super().__init__(strategy)
        self.mean_module = ConstantMean()
        self.covar_module = ScaleKernel(MaternKernel(nu=2.5, ard_num_dims=inducing_points.shape[-1]))

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def main(quick: bool = False):
    n, d, k, batch, iters = (512, 2, 8, 256, 400) if quick else (50_000, 2, 16, 1024, 300)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (n, d))
    f = jnp.sin(4 * x[:, 0]) * jnp.cos(3 * x[:, 1])
    y = f + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (n,))
    test_x = jax.random.uniform(jax.random.PRNGKey(2), (512, d), minval=0.05, maxval=0.95)
    test_f = jnp.sin(4 * test_x[:, 0]) * jnp.cos(3 * test_x[:, 1])

    t0 = time.time()
    model = VNNGP(x, k=k, batch_size=batch)  # builds the IVF index + sequential k-NN
    print(f"IVF k-NN setup at N={n}: {time.time() - t0:.2f} s")
    lik = GaussianLikelihood()
    _ = model(x[:4])  # eager init

    params = {**{f"m.{k_}": v for k_, v in model.trainable_params().items()},
              **{f"l.{k_}": v for k_, v in lik.trainable_params().items()}}
    opt = optax.adam(0.1)
    state = opt.init(params)

    # minibatch over data AND over the stochastic-KL inducing subset (reference :339-465)
    kl_batch = min(256, n - k)

    @jax.jit
    def step(p, s, data_idx, kl_idx):
        def loss_fn(p):
            m_ = model.with_params({kk[2:]: v for kk, v in p.items() if kk.startswith("m.")})
            l_ = lik.with_params({kk[2:]: v for kk, v in p.items() if kk.startswith("l.")})
            # VNNGP trains on the inducing points themselves: x[idx] with matching indices
            out = m_(x[data_idx], indices=data_idx)
            mll = VariationalELBO(l_, m_, num_data=n)
            return -mll(out, y[data_idx], kl_indices=kl_idx)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    rkey = jax.random.PRNGKey(7)
    for i in range(iters):
        rkey, k1, k2 = jax.random.split(rkey, 3)
        data_idx = jax.random.choice(k1, n, shape=(min(batch, n),), replace=False)
        kl_idx = jax.random.choice(k2, n - k, shape=(kl_batch,), replace=False) + k
        params, state, loss = step(params, state, data_idx, kl_idx)
        if not quick and i % 50 == 0:
            print(f"iter {i:4d}  -elbo/n = {float(loss):.4f}")

    model = model.with_params({kk[2:]: v for kk, v in params.items() if kk.startswith("m.")})
    lik = lik.with_params({kk[2:]: v for kk, v in params.items() if kk.startswith("l.")})
    model.eval()
    pred = lik(model(test_x))
    rmse = float(jnp.sqrt(jnp.mean((pred.mean - test_f) ** 2)))
    print(f"VNNGP test RMSE (vs noiseless f): {rmse:.4f}")
    assert rmse < (0.25 if quick else 0.15), rmse
    return rmse


if __name__ == "__main__":
    main()
