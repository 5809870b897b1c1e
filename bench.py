"""Benchmark: mBCG train iteration (inv_quad + SLQ logdet + BBMM gradients) at N=100k.

Mirrors the driver north-star (BASELINE.json): exact-GP training step wall-clock at N=100k,
d=3 (UCI 3droad shape), RBF kernel + Gaussian likelihood, on the real TPU chip.

Prints ONE JSON line:  {"metric", "value" (seconds/iter, lower better), "unit", "vs_baseline"}
``vs_baseline`` = speedup of the fused-Pallas mBCG step over the plain-XLA chunked-matmul
implementation of the same step on the same chip (the direct translation a non-Pallas port
would have used).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def _sync(x):
    # the axon tunnel's block_until_ready doesn't actually block; force a host readback
    return float(jnp.sum(jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), x, 0.0)))


def main():
    import gpytorch_tpu as gp
    from gpytorch_tpu.distributions import MultivariateNormal
    from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
    from gpytorch_tpu.likelihoods import GaussianLikelihood
    from gpytorch_tpu.means import ConstantMean
    from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
    from gpytorch_tpu.models import ExactGP

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    D = 3
    key = jax.random.PRNGKey(0)
    train_x = jax.random.uniform(key, (N, D), dtype=jnp.float32)
    train_y = (
        jnp.sin(4 * train_x[:, 0]) * jnp.cos(3 * train_x[:, 1]) + 0.1 * train_x[:, 2]
        + 0.05 * jax.random.normal(jax.random.PRNGKey(1), (N,), dtype=jnp.float32)
    )

    class Model(ExactGP):
        def __init__(self, tx, ty, lik):
            super().__init__(tx, ty, lik)
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel(ard_num_dims=D))

        def forward(self, x):
            return MultivariateNormal(self.mean_module(x), self.covar_module(x))

    lik = GaussianLikelihood()
    model = Model(train_x, train_y, lik)
    model.likelihood.noise = 0.1
    model.covar_module.base_kernel.lengthscale = 0.5
    params = model.trainable_params()

    solver_settings = dict(
        max_cholesky=0, cg_iters=100, probes=10, tridiag=20, precond=15, minprecond=2000
    )

    def make_step(use_pallas: bool, tx, ty):
        def loss_fn(p):
            m = model.with_params(p)
            m.train_inputs = (tx,)
            m.train_targets = ty
            with gp.settings.max_cholesky_size(0), gp.settings.max_cg_iterations(100), \
                 gp.settings.num_trace_samples(10), gp.settings.max_lanczos_quadrature_iterations(20), \
                 gp.settings.max_preconditioner_size(15), gp.settings.use_pallas(use_pallas):
                mll = ExactMarginalLogLikelihood(m.likelihood, m)
                return -mll(m(tx), ty)

        return jax.jit(jax.value_and_grad(loss_fn))

    def time_step(step, iters=3):
        v, g = step(params)
        _sync(v)  # compile + run once
        t0 = time.time()
        for _ in range(iters):
            v, g = step(params)
            _sync((v, g))
        return (time.time() - t0) / iters, float(v)

    pallas_time, loss_val = time_step(make_step(True, train_x, train_y))
    # baseline ratio measured at a smaller size (the plain-XLA chunked path is too slow to
    # run a full N=100k step inside the bench budget); same-N, same-settings comparison.
    nb = min(N, 20_000)
    try:
        base_t, _ = time_step(make_step(False, train_x[:nb], train_y[:nb]), iters=1)
        pall_t, _ = time_step(make_step(True, train_x[:nb], train_y[:nb]), iters=1)
        vs_baseline = base_t / pall_t
    except Exception:
        vs_baseline = float("nan")
    print(
        json.dumps(
            {
                "metric": f"mbcg_train_iter_n{N}_wallclock",
                "value": round(pallas_time, 4),
                "unit": "s/iter",
                "vs_baseline": round(vs_baseline, 3) if vs_baseline == vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
