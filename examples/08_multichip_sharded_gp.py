"""Multi-chip exact GP: row-sharded mBCG over a device mesh
(reference analogue: examples/02_Scalable_Exact_GPs/Simple_MultiGPU_GP_Regression.ipynb,
kernels/multi_device_kernel.py — rebuilt as shard_map collectives instead of
DataParallel scatter/gather).

Wraps any kernel in `ShardedKernel`: training rows are sharded over the mesh's "data"
axis, every CG matvec computes a local kernel block times the (gathered or ring-exchanged)
direction block, and inner products are psum-reduced so all devices follow one CG
trajectory. Runs here on 8 virtual CPU devices; on a TPU pod slice the same code uses ICI.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")  # virtual 8-device host mesh for the demo

import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

import gpytorch_tpu as gp
from gpytorch_tpu.distributed import ShardedKernel, make_sharded_mll, sharded_posterior
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.models import ExactGP


class ShardedGP(ExactGP):
    def __init__(self, train_x, train_y, likelihood, num_devices):
        super().__init__(train_x, train_y, likelihood)
        self.mean_module = ConstantMean()
        # ring=True streams X blocks device-to-device via ppermute so no device ever
        # holds the full training set (the "ring attention" of GP inference)
        self.covar_module = ShardedKernel(
            ScaleKernel(RBFKernel(ard_num_dims=2)), num_devices=num_devices, ring=False
        )

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def main():
    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("data",))
    n = 1024  # divisible by the mesh size
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (n, 2))
    y = jnp.sin(x[:, 0] * 4) * jnp.cos(x[:, 1] * 3) + 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), (n,)
    )

    model = ShardedGP(x, y, GaussianLikelihood(), n_dev)
    params = model.trainable_params()
    opt = optax.adam(0.1)
    state = opt.init(params)

    with gp.settings.max_cg_iterations(150), gp.settings.num_trace_samples(16):
        mll_fn = make_sharded_mll(mesh, model)

        @jax.jit
        def step(p, s, k):
            loss, grads = jax.value_and_grad(lambda p: -mll_fn(p, x, y, key=k))(p)
            updates, s = opt.update(grads, s)
            return optax.apply_updates(p, updates), s, loss

        pkey = jax.random.PRNGKey(2)
        for i in range(40):
            pkey, sub = jax.random.split(pkey)
            params, state, loss = step(params, state, sub)
            if i % 10 == 0:
                print(f"iter {i:3d}  loss {float(loss):.4f}   (on {n_dev} devices)")

        # sharded posterior: mean and variance computed with collective CG
        test_x = jax.random.uniform(jax.random.PRNGKey(3), (64, 2))
        m = model.with_params(params)
        post = sharded_posterior(mesh, m, x, y, test_x)
        truth = jnp.sin(test_x[:, 0] * 4) * jnp.cos(test_x[:, 1] * 3)
        print("test MAE:", float(jnp.mean(jnp.abs(post.mean - truth))))


if __name__ == "__main__":
    main()
