"""Scalable exact GP: KISS-GP (SKI) + LOVE fast variances
(reference: examples/02_Scalable_Exact_GPs/KISSGP_Regression.ipynb and
Simple_GP_Regression_With_LOVE_Fast_Variances_and_Sampling.ipynb).

The kernel is interpolated from a dense grid (W K_UU Wᵀ), so matvecs are O(n + m log m);
LOVE caches a Lanczos root-inverse for O(k)-per-point predictive variances.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import time

import jax.numpy as jnp
import optax

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import GridInterpolationKernel, RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
from gpytorch_tpu.models import ExactGP


class KISSGPModel(ExactGP):
    def __init__(self, train_x, train_y, likelihood):
        super().__init__(train_x, train_y, likelihood)
        self.mean_module = ConstantMean()
        self.covar_module = GridInterpolationKernel(
            ScaleKernel(RBFKernel()), grid_size=128, num_dims=1, grid_bounds=[(0.0, 1.0)]
        )

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def main():
    # Persistent XLA compilation cache: serving restarts skip re-compiling the
    # posterior programs (same knob bench.py and the test suite use)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/gpytorch_tpu_jit_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    n = 1000
    train_x = jnp.linspace(0, 1, n)
    train_y = jnp.sin(train_x * 4 * jnp.pi) + 0.1 * jax.random.normal(jax.random.PRNGKey(0), (n,))

    model = KISSGPModel(train_x, train_y, GaussianLikelihood())
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

    for _ in range(30):
        params, state, loss = step(params, state)
    print("final loss:", float(loss))

    model = model.with_params(params).eval()
    test_x = jnp.linspace(0.01, 0.99, 501)
    test_y = jnp.sin(test_x * 4 * jnp.pi)

    # exact predictive variances
    t0 = time.time()
    pred_exact = model.likelihood(model(test_x))
    var_exact = pred_exact.variance
    print(f"exact covar path: {time.time() - t0:.2f}s")

    # LOVE: Lanczos root-inverse cache; cheap variances and posterior samples
    model.clear_caches()
    with gp.settings.fast_pred_var(), gp.settings.fast_pred_samples(), \
         gp.settings.max_root_decomposition_size(64):
        t0 = time.time()
        pred_love = model.likelihood(model(test_x))
        var_love = pred_love.variance
        print(f"LOVE covar path:  {time.time() - t0:.2f}s")
        samples = pred_love.rsample(jax.random.PRNGKey(1), sample_shape=(16,))

        # Serving pattern: jit the cached-variance call (the caches are concrete after
        # the cold call above, so the compiled program is just the small cached matvecs)
        # — with the persistent compilation cache (enabled at the top of main()) a
        # process restart skips recompiling, so the COLD serving wall is one compile-
        # cache hit + the cache-build execute, not the eager per-op path.
        var_fn = jax.jit(lambda: model(test_x).variance)
        var_fn()  # compile (or persistent-cache hit)
        t0 = time.time()
        var_fn().block_until_ready()
        print(f"LOVE cached+jitted serving latency: {time.time() - t0:.4f}s")

    print("max |var_exact - var_love|:", float(jnp.max(jnp.abs(var_exact - var_love))))
    print("MAE:", float(jnp.mean(jnp.abs(pred_exact.mean - test_y))))
    print("posterior samples shape:", samples.shape)


if __name__ == "__main__":
    main()
