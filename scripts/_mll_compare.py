"""Fixed-hyper MLL comparison of the two measured terminal basins at N=100k.

Round-4 NLL-spread diagnosis: bench training lands in one of two hyperparameter
basins — "floor" (noise pinned at the 1.5e-2 constraint floor, joint NLL ~ -0.153)
and "escaped" (noise ~ 0.021-0.022, NLL ~ -0.24..-0.26, matching the oracle band).
This script evaluates a LOW-BIAS marginal log likelihood (HIGHEST-precision K.V
tiles, NTRI=20, stall-gated cold mBCG, 63 probes) at both measured terminal hyper
sets, over several probe keys.  If the escaped basin has the higher exact MLL, the
spread is an optimization problem (fixable by schedule/floor); if the floor basin
wins, the MLL itself prefers the mis-calibrated point and the fix is calibration.

Hypers captured from /tmp/sweep_r4.jsonl (2026-08-19 on-chip sweep).
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
from gpytorch_tpu.models import ExactGP

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


class Model(ExactGP):
    def __init__(self, tx, ty, lik):
        super().__init__(tx, ty, lik)
        self.mean_module = ConstantMean()
        self.covar_module = ScaleKernel(RBFKernel(ard_num_dims=D))

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


BASINS = {
    # run tag in sweep_r4.jsonl         noise     outputscale  lengthscale
    "floor (default_seed2)": (0.01612, 1.17, [0.3791, 0.6017, 0.4306]),
    "escaped (default_seed4)": (0.02172, 1.6335, [0.2788, 0.4193, 0.5974]),
    "escaped63 (probes63_seed3)": (0.02054, 1.7923, [0.3371, 0.3846, 0.6483]),
}


def mll_at(noise, outputscale, lengthscale, pkey):
    lik = GaussianLikelihood(noise_constraint=gp.constraints.GreaterThan(1.0e-2))
    model = Model(train_x, train_y, lik)
    model.likelihood.noise = noise
    model.covar_module.outputscale = outputscale
    model.covar_module.base_kernel.lengthscale = jnp.asarray(lengthscale)

    def value(p, k):
        m = model.with_params(p)
        m.train_inputs = (train_x,)
        m.train_targets = train_y
        with gp.settings.max_cholesky_size(1), \
             gp.settings.max_cg_iterations(150), \
             gp.settings.cg_tolerance(0.1), \
             gp.settings.num_trace_samples(63), \
             gp.settings.max_lanczos_quadrature_iterations(20), \
             gp.settings.max_preconditioner_size(50), \
             gp.settings.cg_stall_window(10), \
             gp.settings.kernel_matvec_highest(True), \
             gp.settings.precond_logdet_vr(True):
            mll = ExactMarginalLogLikelihood(m.likelihood, m)
            return mll(m(train_x), train_y, key=k)

    fn = jax.jit(value)
    p = model.trainable_params()
    t0 = time.time()
    v = float(fn(p, pkey))
    return v, time.time() - t0


for tag, (noise, os_, ls) in BASINS.items():
    vals = []
    for s in (101, 202, 303):
        v, dt = mll_at(noise, os_, ls, jax.random.PRNGKey(s))
        vals.append(v)
        print(f"MLL[{tag}] key={s}: {v:.6f}  ({dt:.1f}s)", flush=True)
    m = sum(vals) / len(vals)
    sp = max(vals) - min(vals)
    print(f"MLL[{tag}] mean={m:.6f} spread={sp:.2e}", flush=True)
print("MLL_COMPARE DONE", flush=True)
