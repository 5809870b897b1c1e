"""On-chip check: joint NLPD from the EXACT posterior covariance (fast_pred_var off).

The LOVE rank-100 joint covariance at 2048 test points is wildly indefinite (measured
eig range [-3.34, 1.90], 2026-08-19) — the exact Schur-complement covariance is PSD by
construction, so its dense Cholesky log_prob is deterministic and finite.

Usage: python _eval_nll_exact.py <noise> <outputscale> <l1> <l2> <l3>
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
N, N_TEST, D = 100_000, 2048, 3

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
st.enter_context(gp.settings.fast_pred_var(False))

with st:
    t0 = time.time()
    pred = model.likelihood(model(test_x))
    rmse = float(jnp.sqrt(mean_squared_error(pred, test_y)))
    print(f"rmse={rmse:.4f}  ({time.time()-t0:.0f}s)", flush=True)
    t1 = time.time()
    cov = pred.lazy_covariance_matrix.to_dense()
    cov = 0.5 * (cov + cov.T)
    w = jnp.linalg.eigvalsh(cov)
    print(
        f"exact predictive covariance eig range: [{float(w[0]):.3e}, {float(w[-1]):.3e}]"
        f"  n_neg={int(jnp.sum(w < 0))}  ({time.time()-t1:.0f}s)",
        flush=True,
    )
    t1 = time.time()
    with gp.settings.max_cholesky_size(4096):
        nll = float(negative_log_predictive_density(pred, test_y))
    print(f"joint NLPD exact-covar: {nll:.4f}  ({time.time()-t1:.0f}s)", flush=True)
