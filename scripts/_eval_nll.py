"""Post-pass joint-NLPD evaluator + indefiniteness diagnostics for the bench model.

Rebuilds the bench's data and model (bench.py:171-207), sets the terminal hypers passed
on the CLI (the values bench.py prints per seed), runs the same eval block, and reports:

  - RMSE and marginal NLPD (sanity: must match the bench run that produced the hypers)
  - eigenvalue range of the dense predictive covariance (K_tt − LOVE root + σ²I) — the
    diagnostic for the exact-Cholesky joint NLPD NaN seen on-chip 2026-08-19
  - joint NLPD via the exact dense path at several cholesky_max_tries, and via the
    stochastic mBCG path

Usage: python _eval_nll.py <noise> <outputscale> <l1> <l2> <l3> [N=100000]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import contextlib
import sys
import time

import jax
import jax.numpy as jnp

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.metrics import mean_squared_error, negative_log_predictive_density
from gpytorch_tpu.models import ExactGP

noise, outputscale = float(sys.argv[1]), float(sys.argv[2])
ls = [float(a) for a in sys.argv[3:6]]
N = int(sys.argv[6]) if len(sys.argv) > 6 else 100_000
N_TEST, D = 2048, 3

key = jax.random.PRNGKey(0)
all_x = jax.random.uniform(key, (N + N_TEST, D), dtype=jnp.float32)
f = (
    jnp.sin(4 * all_x[:, 0]) * jnp.cos(3 * all_x[:, 1])
    + 0.5 * jnp.sin(7 * all_x[:, 2] * all_x[:, 0])
    + 0.1 * all_x[:, 2]
)
all_y = f + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (N + N_TEST,), dtype=jnp.float32)
all_y = (all_y - jnp.mean(all_y)) / jnp.std(all_y)
train_x, train_y = all_x[:N], all_y[:N]
test_x, test_y = all_x[N:], all_y[N:]


class Model(ExactGP):
    def __init__(self, tx, ty, lik):
        super().__init__(tx, ty, lik)
        self.mean_module = ConstantMean()
        self.covar_module = ScaleKernel(RBFKernel(ard_num_dims=D))

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


model = Model(train_x, train_y, GaussianLikelihood())
model.likelihood.noise = noise
model.covar_module.outputscale = outputscale
model.covar_module.base_kernel.lengthscale = jnp.asarray(ls)
model = model.eval()


def eval_ctx():
    st = contextlib.ExitStack()
    st.enter_context(gp.settings.max_cholesky_size(0))
    st.enter_context(gp.settings.use_pallas(True))
    st.enter_context(gp.settings.kernel_matvec_bf16(False))
    st.enter_context(gp.settings.kernel_matvec_highest(True))
    st.enter_context(gp.settings.eval_cg_tolerance(1e-3))
    st.enter_context(gp.settings.max_preconditioner_size(50))
    st.enter_context(gp.settings.max_cg_iterations(1000))
    st.enter_context(gp.settings.cg_stall_window(50))
    st.enter_context(gp.settings.preconditioner_noise_budget(1e-3))
    st.enter_context(gp.settings.fast_pred_var(True))
    st.enter_context(gp.settings.max_root_decomposition_size(100))
    return st


t0 = time.time()
with eval_ctx():
    pred = model.likelihood(model(test_x))
    rmse = float(jnp.sqrt(mean_squared_error(pred, test_y)))
    var = pred.variance
    z2 = (pred.mean - test_y) ** 2 / var
    marg = float(jnp.mean(0.5 * (jnp.log(2 * jnp.pi * var) + z2)))
    print(f"rmse={rmse:.4f} marginal={marg:.4f}  ({time.time()-t0:.0f}s)", flush=True)

    cov = pred.lazy_covariance_matrix.to_dense()
    cov = 0.5 * (cov + cov.T)
    w = jnp.linalg.eigvalsh(cov)
    print(
        f"predictive covariance eig range: [{float(w[0]):.3e}, {float(w[-1]):.3e}]"
        f"  n_neg={int(jnp.sum(w < 0))}  min_diag={float(jnp.min(jnp.diagonal(cov))):.3e}",
        flush=True,
    )

    for tries in (3, 6, 8):
        with gp.settings.max_cholesky_size(4096), gp.settings.cholesky_max_tries(tries):
            t1 = time.time()
            nll = float(negative_log_predictive_density(pred, test_y))
            print(f"joint NLPD exact (max_tries={tries}): {nll:.4f}  ({time.time()-t1:.0f}s)", flush=True)

    with gp.settings.max_preconditioner_size(50):
        t1 = time.time()
        nll_s = float(negative_log_predictive_density(pred, test_y))
        print(f"joint NLPD stochastic: {nll_s:.4f}  ({time.time()-t1:.0f}s)", flush=True)

# Exact posterior covariance (no LOVE truncation): Schur complement via batched CG —
# PSD up to CG tolerance, so the dense Cholesky log_prob needs no jitter escalation.
with eval_ctx(), gp.settings.fast_pred_var(False), gp.settings.max_cholesky_size(4096):
    t1 = time.time()
    model2 = model.eval()  # fresh caches
    pred_exact = model2.likelihood(model2(test_x))
    nll_e = float(negative_log_predictive_density(pred_exact, test_y))
    print(f"joint NLPD exact-covar (fast_pred_var off): {nll_e:.4f}  ({time.time()-t1:.0f}s)", flush=True)
    cov2 = pred_exact.lazy_covariance_matrix.to_dense()
    w2 = jnp.linalg.eigvalsh(0.5 * (cov2 + cov2.T))
    print(f"exact-covar eig range: [{float(w2[0]):.3e}, {float(w2[-1]):.3e}]", flush=True)
