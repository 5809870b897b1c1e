"""Dissect the non-kernel backward of the rhs-warm flagship step (round-4 queue K).

The queue-D split leaves a ~53 ms "other backward (probe-norm VJP, Woodbury VJP,
reductions)" bucket = (vg - fwd) - fused_kernel - VR.  This script triangulates it by
timing jitted variants of the EXACT bench step at the shipped defaults (NTRI=8, 63
probes, rhs-warm, VR) on the real chip:

  * fwd_it8_s       — forward-only loss (warm state, NTRI floor)
  * vg_it8_s        — full value_and_grad (VR on)       -> backward = vg - fwd
  * vg_it8_novr_s   — VR off                            -> VR cost = vg - novr
  * vg_iqonly_s     — inv_quad term only (logdet=False) -> logdet backward share
  * fwd_u8_s/vg_u8_s — same with cg_unroll(8)           -> unroll effect fwd/bwd
  * vg_p31_s        — 31 probes (VR on)                 -> column-width scaling of
                       the non-kernel backward (est reductions, probe-norm VJP)

Usage: [BENCH_* envs] python scripts/_prof_bwd2.py [N]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
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

    lik = GaussianLikelihood(noise_constraint=gp.constraints.GreaterThan(2.0e-2))
    model = Model(x, y, lik)
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

    ntri = int(os.environ.get("BENCH_NTRI", "7"))  # aligned with the shipped default
    probes = int(os.environ.get("BENCH_PROBES", "63"))
    k0 = jax.random.PRNGKey(7)
    st0 = jnp.zeros((N, 1), jnp.float32)

    def loss_fn(p, k, st, vr=True, n_probes=probes, unroll=0, logdet=True):
        m = model.with_params(p)
        m.train_inputs = (x,)
        m.train_targets = y
        with _solver_ctx(gp), gp.settings.precond_logdet_vr(vr), \
                gp.settings.num_trace_samples(n_probes), gp.settings.cg_unroll(unroll), \
                gp.settings.max_lanczos_quadrature_iterations(ntri):
            if not logdet:
                # inv_quad term only: same warm rhs solve, no probe columns, no SLQ
                mvn = m.likelihood.marginal(m(x))
                covar = mvn.lazy_covariance_matrix.evaluate_kernel()
                diff = (y - mvn.mean)[..., None]
                from gpytorch_tpu.solvers.inv_quad import inv_quad_logdet_mbcg
                (iq, _), new_st = inv_quad_logdet_mbcg(
                    covar, diff, logdet=False, key=k, solver_state=st, return_state=True)
                return iq[..., 0] if iq.ndim else iq, new_st
            mll = ExactMarginalLogLikelihood(m.likelihood, m)
            val, new_st = mll(m(x), y, key=k, solver_state=st, return_state=True)
            return -val, new_st

    # realistic warm state: one prior solve so the rhs column converges inside the floor
    _, st_warm = jax.jit(lambda p, k, st: loss_fn(p, k, st))(params, k0, st0)

    def vg(p, k, st, **kw):
        (l, _), g = jax.value_and_grad(
            lambda pp: loss_fn(pp, k, st, **kw), has_aux=True)(p)
        return l, g

    timeit(f"fwd_it{ntri}_s", jax.jit(lambda p, k, st: loss_fn(p, k, st)[0]),
           params, k0, st_warm)
    timeit(f"vg_it{ntri}_s", jax.jit(lambda p, k, st: vg(p, k, st)), params, k0, st_warm)
    timeit(f"vg_it{ntri}_novr_s", jax.jit(lambda p, k, st: vg(p, k, st, vr=False)),
           params, k0, st_warm)
    timeit("vg_iqonly_s", jax.jit(lambda p, k, st: vg(p, k, st, logdet=False)),
           params, k0, st_warm)
    timeit(f"fwd_u{ntri}_s", jax.jit(lambda p, k, st: loss_fn(p, k, st, unroll=ntri)[0]),
           params, k0, st_warm)
    timeit(f"vg_u{ntri}_s", jax.jit(lambda p, k, st: vg(p, k, st, unroll=ntri)),
           params, k0, st_warm)
    timeit("vg_p31_s", jax.jit(lambda p, k, st: vg(p, k, st, n_probes=31)),
           params, k0, st_warm)
    print("PROF_BWD2 DONE", flush=True)


if __name__ == "__main__":
    main()
