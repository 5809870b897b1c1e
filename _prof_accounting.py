"""Close the per-step time accounting of the N=100k flagship train step (VERDICT r2 ask #2).

Runs the exact bench.py training configuration for BENCH_ACC_STEPS steps, records each
step's wall time (synced; the measured ~35 ms axon readback RTT from _prof_rtt.py is
subtracted) and its CG iteration count (captured from the verbose_linalg jit callback),
then fits  t_step ≈ fixed + per_iter · cg_iters  by least squares.  `fixed` is the
iteration-independent cost (preconditioner build + probe draw + fused BBMM backward +
dispatch); `per_iter` is one fused K·V matvec.  The fit closes the accounting when the
predicted times track the measured ones — the residual column says how much is left.

Usage: [BENCH_* env overrides as for bench.py] python _prof_accounting.py [N]
"""
import logging
import os
import sys
import time

import jax
import jax.numpy as jnp

RTT_S = float(os.environ.get("BENCH_RTT", "0.035"))  # measured by _prof_rtt.py


class _IterCapture(logging.Handler):
    def __init__(self):
        super().__init__()
        self.iters = []

    def emit(self, record):
        msg = record.getMessage()
        if "linear_cg" in msg and "-> " in msg:
            self.iters.append(int(msg.split("-> ")[1].split(" iters")[0]))


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
        with _solver_ctx(gp), gp.settings.verbose_linalg(True):
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

    cap = _IterCapture()
    gp.settings.logger.addHandler(cap)
    gp.settings.logger.setLevel(logging.INFO)
    gp.settings.logger.propagate = False

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
    cap.iters.clear()

    times, iters_per_step = [], []
    for i in range(n_steps):
        pkey, sub = jax.random.split(pkey)
        n_before = len(cap.iters)
        t0 = time.perf_counter()
        p, s, loss, st = step(p, s, sub, st)
        float(loss)  # sync (includes one tunnel RTT)
        times.append(time.perf_counter() - t0 - RTT_S)
        new = cap.iters[n_before:]
        iters_per_step.append(new[-1] if new else -1)

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
