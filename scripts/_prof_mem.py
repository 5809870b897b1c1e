"""Peak-HBM ablation of the fused Pallas streaming matvec vs the plain-XLA chunked path
(VERDICT r4 ask #9: the fusion's primary claim is memory — measure it).

Runs ONE flagship training step (value_and_grad of the rhs-warm mBCG MLL) at N and
reports the device's peak_bytes_in_use.  Run each mode in its OWN process — PJRT peak
counters are process-lifetime, so a single process measuring both would alias them.

Usage: python scripts/_prof_mem.py fused|chunked [N]
Prints one JSON line: {"mode", "n", "peak_hbm_gib", "step_s"}.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    use_pallas = mode == "fused"

    import gpytorch_tpu as gp
    from bench import _solver_ctx
    from gpytorch_tpu.distributions import MultivariateNormal
    from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
    from gpytorch_tpu.likelihoods import GaussianLikelihood
    from gpytorch_tpu.means import ConstantMean
    from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
    from gpytorch_tpu.models import ExactGP

    D = 3
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (N, D), dtype=jnp.float32)
    y = jnp.sin(4 * x[:, 0]) * jnp.cos(3 * x[:, 1]) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (N,), dtype=jnp.float32
    )
    y = (y - jnp.mean(y)) / jnp.std(y)

    class Model(ExactGP):
        def __init__(self, tx, ty, lik):
            super().__init__(tx, ty, lik)
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel(ard_num_dims=D))

        def forward(self, xx):
            return MultivariateNormal(self.mean_module(xx), self.covar_module(xx))

    lik = GaussianLikelihood(noise_constraint=gp.constraints.GreaterThan(2.0e-2))
    model = Model(x, y, lik)
    model.likelihood.noise = 0.05
    model.covar_module.base_kernel.lengthscale = 0.5
    params = model.trainable_params()

    def loss_fn(p, k, st):
        m = model.with_params(p)
        m.train_inputs = (x,)
        m.train_targets = y
        with _solver_ctx(gp, use_pallas=use_pallas):
            mll = ExactMarginalLogLikelihood(m.likelihood, m)
            val, new_st = mll(m(x), y, key=k, solver_state=st, return_state=True)
            return -val, new_st

    vg = jax.jit(lambda p, k, st: jax.value_and_grad(loss_fn, has_aux=True)(p, k, st))
    st0 = jnp.zeros((N, 1), jnp.float32)
    k0 = jax.random.PRNGKey(7)

    def sync(v):
        return float(jnp.sum(jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), v, 0.0)))

    sync(vg(params, k0, st0))  # compile + run
    t0 = time.perf_counter()
    sync(vg(params, k0, st0))
    step_s = time.perf_counter() - t0

    dev = jax.local_devices()[0]
    try:
        stats = dev.memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
    except Exception:
        peak = None
    print(json.dumps({
        "mode": mode,
        "n": N,
        "peak_hbm_gib": round(peak / 2**30, 3) if peak else None,
        "step_s": round(step_s, 3),
    }))


if __name__ == "__main__":
    main()
