"""Component-level split of the rhs-warm flagship step at N=100k (VERDICT r2 ask #2).

The replay fit (_prof_accounting.py) closes the step as t = fixed + per_iter * cg_iters
(cold, on-chip 2026-08-18: 194 ms fixed + 35.9 ms/iter, R^2 0.95).  This script names the
pieces of `fixed` by timing jitted subcomputations of the EXACT bench configuration:

  * matvec_high_t32_s  — one fused high-mode K(100k,100k)·V(·,32) streaming matvec (the
    per-CG-iteration unit)
  * pc_build_s         — rank-50 tau-regularized pivoted-Cholesky build
  * pc_probes_s        — build + 31-probe N(0,P) draw (probe cost = this − pc_build)
  * fwd_itK_s          — forward-only -mll at the NTRI-floored iteration count
  * vg_itK_s           — value_and_grad of the same (backward cost = this − fwd)
  * vg_itK_novr_s      — VR off (the VR differentiable P rebuild = vg_itK − this)

Usage: [BENCH_* envs] python _prof_fixed2.py [N]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import contextlib
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    import gpytorch_tpu as gp
    from bench import _solver_ctx
    from gpytorch_tpu.distributions import MultivariateNormal
    from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
    from gpytorch_tpu.likelihoods import GaussianLikelihood
    from gpytorch_tpu.means import ConstantMean
    from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
    from gpytorch_tpu.models import ExactGP

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    D = 3
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (N, D), dtype=jnp.float32)
    f = jnp.sin(4 * x[:, 0]) * jnp.cos(3 * x[:, 1]) + 0.5 * jnp.sin(7 * x[:, 2] * x[:, 0]) + 0.1 * x[:, 2]
    y = f + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (N,), dtype=jnp.float32)
    y = (y - jnp.mean(y)) / jnp.std(y)

    class Model(ExactGP):
        def __init__(self, tx, ty, lik):
            super().__init__(tx, ty, lik)
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel(ard_num_dims=D))

        def forward(self, xx):
            return MultivariateNormal(self.mean_module(xx), self.covar_module(xx))

    lik = GaussianLikelihood(noise_constraint=gp.constraints.GreaterThan(1.5e-2))
    model = Model(x, y, lik)
    # mid-training-ish hypers (the warm regime the bench spends its budget in)
    model.likelihood.noise = 0.05
    model.covar_module.outputscale = 0.8
    model.covar_module.base_kernel.lengthscale = jnp.array([0.45, 0.5, 0.45])
    params = model.trainable_params()

    def sync(v):
        return float(jnp.sum(jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), v, 0.0)))

    def timeit(tag, fn, *a, reps=3):
        sync(fn(*a))  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn(*a))
            best = min(best, time.perf_counter() - t0)
        print(f'{{"{tag}": {best:.4f}}}', flush=True)
        return best

    ntri = int(os.environ.get("BENCH_NTRI", "10"))
    probes = int(os.environ.get("BENCH_PROBES", "31"))
    k0 = jax.random.PRNGKey(7)
    st0 = jnp.zeros((N, 1), jnp.float32)

    # one fused high-mode matvec at the mBCG column width (1 rhs + probes)
    V = jax.random.normal(jax.random.PRNGKey(3), (N, 1 + probes), jnp.float32)

    def matvec(p, v):
        m = model.with_params(p)
        m.train_inputs = (x,)
        m.train_targets = y
        with _solver_ctx(gp):
            covar = m.likelihood.marginal(m(x)).lazy_covariance_matrix.evaluate_kernel()
            return covar._matmul(v)

    timeit(f"matvec_high_t{1 + probes}_s", jax.jit(matvec), params, V)

    def pbuild(p):
        m = model.with_params(p)
        m.train_inputs = (x,)
        m.train_targets = y
        with _solver_ctx(gp):
            covar = m.likelihood.marginal(m(x)).lazy_covariance_matrix.evaluate_kernel()
            _, _, logdet_P = covar._preconditioner()
            return logdet_P

    timeit("pc_build_s", jax.jit(pbuild), params)

    def pprobe(p):
        m = model.with_params(p)
        m.train_inputs = (x,)
        m.train_targets = y
        with _solver_ctx(gp):
            covar = m.likelihood.marginal(m(x)).lazy_covariance_matrix.evaluate_kernel()
            _, P_op, logdet_P = covar._preconditioner()
            z = P_op.zero_mean_mvn_samples(jax.random.PRNGKey(3), probes)
            return jnp.sum(z) + logdet_P

    timeit("pc_probes_s", jax.jit(pprobe), params)

    def loss_fn(p, k, st, vr):
        m = model.with_params(p)
        m.train_inputs = (x,)
        m.train_targets = y
        with _solver_ctx(gp), gp.settings.precond_logdet_vr(vr), \
                gp.settings.max_lanczos_quadrature_iterations(ntri):
            mll = ExactMarginalLogLikelihood(m.likelihood, m)
            val, new_st = mll(m(x), y, key=k, solver_state=st, return_state=True)
            return -val, new_st

    # warm state at the NTRI floor: one prior solve to get a realistic x0 (so the rhs
    # column converges inside the floor and CG runs exactly ~ntri iterations, like a
    # mid-training warm step)
    _, st_warm = jax.jit(lambda p, k, st: loss_fn(p, k, st, True))(params, k0, st0)

    timeit(f"fwd_it{ntri}_s", jax.jit(lambda p, k, st: loss_fn(p, k, st, True)[0]),
           params, k0, st_warm)

    def vg(p, k, st, vr):
        (l, new_st), g = jax.value_and_grad(lambda pp: loss_fn(pp, k, st, vr), has_aux=True)(p)
        return l, g

    timeit(f"vg_it{ntri}_s", jax.jit(lambda p, k, st: vg(p, k, st, True)), params, k0, st_warm)
    timeit(f"vg_it{ntri}_novr_s", jax.jit(lambda p, k, st: vg(p, k, st, False)), params, k0, st_warm)
    print("FIXED2 DONE", flush=True)


if __name__ == "__main__":
    main()
