"""Close the per-step time accounting of the N=100k flagship train step (VERDICT r2 ask #2).

Runs the exact bench.py training configuration for BENCH_ACC_STEPS steps, records each
step's wall time (synced; the measured ~35 ms axon readback RTT from _prof_rtt.py is
subtracted) and its parameter snapshot, then REPLAYS the forward solve at each snapshot
to read the CG iteration count as a jit output (the axon plugin does not support
debug.callback, so verbose_linalg's jit logging cannot run on-chip), and finally fits
t_step ≈ fixed + per_iter · cg_iters by least squares.  `fixed` is the
iteration-independent cost (preconditioner build + probe draw + fused BBMM backward +
dispatch); `per_iter` is one fused K·V matvec.  The fit closes the accounting when the
predicted times track the measured ones — the residual column says how much is left.

Usage: [BENCH_* env overrides as for bench.py] python _prof_accounting.py [N]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
import time

import jax
import jax.numpy as jnp

RTT_S = float(os.environ.get("BENCH_RTT", "0.035"))  # measured by _prof_rtt.py


def main():
    import optax

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
    model.likelihood.noise = 0.1
    model.covar_module.base_kernel.lengthscale = 0.5
    params = model.trainable_params()

    _warm_mode = os.environ.get("BENCH_WARM", "0")
    _warm_any = _warm_mode in ("1", "rhs")
    opt = optax.adam(0.1)

    def loss_fn(p, k, st):
        m = model.with_params(p)
        m.train_inputs = (x,)
        m.train_targets = y
        with _solver_ctx(gp):
            mll = ExactMarginalLogLikelihood(m.likelihood, m)
            if _warm_any:
                val, new_st = mll(m(x), y, key=k, solver_state=st, return_state=True)
                return -val, new_st
            return -mll(m(x), y, key=k), st

    @jax.jit
    def step(p, s, k, st):
        (loss, new_st), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, k, st)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss, new_st

    probes = int(os.environ.get("BENCH_PROBES", "31"))
    if _warm_mode == "rhs":
        st = jnp.zeros((N, 1), dtype=jnp.float32)
    elif _warm_mode == "1":
        st = jnp.zeros((N, 1 + probes), dtype=jnp.float32)
    else:
        st = jnp.zeros((1, 1), dtype=jnp.float32)

    pkey = jax.random.PRNGKey(2)
    p, s = params, opt.init(params)
    n_steps = int(os.environ.get("BENCH_ACC_STEPS", "40"))

    pkey, sub = jax.random.split(pkey)
    p, s, loss, st = step(p, s, sub, st)
    float(loss)  # compile

    # replay fn: exactly the mBCG forward's CG inputs (rhs + P-sampled normalized probes)
    # at a given param snapshot, returning num_iters as a jit output
    from gpytorch_tpu.solvers.cg import linear_cg

    n_tri = 0 if _warm_mode == "1" else int(os.environ.get("BENCH_NTRI", "5"))

    @jax.jit
    def count_iters(p, k, st_):
        m = model.with_params(p)
        m.train_inputs = (x,)
        m.train_targets = y
        with _solver_ctx(gp):
            mvn = m.likelihood.marginal(m(x))
            covar = mvn.lazy_covariance_matrix.evaluate_kernel()
            apply_P, P_op, _ = covar._preconditioner()
            if P_op is not None:
                z = jnp.moveaxis(P_op.zero_mean_mvn_samples(k, probes), 0, -1)
            else:  # below min_preconditioning_size: i.i.d. normal probes
                z = jax.random.normal(k, (x.shape[0], probes), dtype=jnp.float32)
            z = z / jnp.sqrt(jnp.maximum(jnp.sum(z * z, axis=-2, keepdims=True), 1e-20))
            rhs = (y - mvn.mean)[:, None]
            rhs_all = jnp.concatenate([rhs, z], axis=-1)
            if _warm_mode == "rhs":
                x0 = jnp.concatenate([st_, jnp.zeros_like(z)], axis=-1)
                res = linear_cg(covar._matmul, rhs_all, precond_fn=apply_P,
                                n_tridiag_iter=n_tri, x0=x0, conv_cols=1)
            elif _warm_mode == "1":
                res = linear_cg(covar._matmul, rhs_all, precond_fn=apply_P,
                                n_tridiag_iter=0, x0=st_)
            else:
                res = linear_cg(covar._matmul, rhs_all, precond_fn=apply_P, n_tridiag_iter=n_tri)
            return res.num_iters

    times, snaps = [], []
    for i in range(n_steps):
        pkey, sub = jax.random.split(pkey)
        snaps.append((p, sub, st))
        t0 = time.perf_counter()
        p, s, loss, st = step(p, s, sub, st)
        float(loss)  # sync (includes one tunnel RTT)
        times.append(time.perf_counter() - t0 - RTT_S)

    iters_per_step = [int(count_iters(pp, kk, ss)) for pp, kk, ss in snaps]

    import numpy as np

    t = np.array(times)
    it = np.array(iters_per_step, dtype=np.float64)
    ok = it >= 0
    A = np.stack([np.ones(ok.sum()), it[ok]], axis=1)
    coef, *_ = np.linalg.lstsq(A, t[ok], rcond=None)
    fixed, per_iter = float(coef[0]), float(coef[1])
    pred = A @ coef
    resid = t[ok] - pred
    print(f"steps={n_steps} N={N} warm={_warm_mode}")
    print(f"iters: min {it[ok].min():.0f} max {it[ok].max():.0f} mean {it[ok].mean():.1f}")
    print(f"t_step = {fixed*1e3:.1f} ms fixed + {per_iter*1e3:.2f} ms/iter  "
          f"(R^2 = {1 - resid.var() / t[ok].var():.3f}, resid std {resid.std()*1e3:.1f} ms)")
    print(f"mean step {t.mean():.4f} s; fixed share {fixed / t.mean() * 100:.0f}%")
    for i in range(0, n_steps, max(1, n_steps // 10)):
        print(f"  step {i:3d}: {t[i]:.3f} s  iters {iters_per_step[i]}")
    print("ACCOUNTING DONE", flush=True)


if __name__ == "__main__":
    main()
