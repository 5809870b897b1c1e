"""Dissect the LOVE cold-eval latency at N=100k: preconditioner build, mean CG solve,
Lanczos root build, NLPD marginal. Run at post-training-like hypers."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import contextlib, time, os, sys
import jax, jax.numpy as jnp
import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.models import ExactGP

N, NT, D = 100000, 2048, 3
key = jax.random.PRNGKey(0)
all_x = jax.random.uniform(key, (N+NT, D), jnp.float32)
f = jnp.sin(4*all_x[:,0])*jnp.cos(3*all_x[:,1]) + 0.5*jnp.sin(7*all_x[:,2]*all_x[:,0]) + 0.1*all_x[:,2]
all_y = f + 0.1*jax.random.normal(jax.random.PRNGKey(1), (N+NT,))
all_y = (all_y - all_y.mean())/all_y.std()
x, y, tx = all_x[:N], all_y[:N], all_x[N:]

class Model(ExactGP):
    def __init__(s, a, b, lik):
        super().__init__(a, b, lik)
        s.mean_module = ConstantMean(); s.covar_module = ScaleKernel(RBFKernel(ard_num_dims=D))
    def forward(s, xx): return MultivariateNormal(s.mean_module(xx), s.covar_module(xx))

lik = GaussianLikelihood()
m = Model(x, y, lik)
m.likelihood.noise = 0.0172
m.covar_module.outputscale = 1.98
m.covar_module.base_kernel.lengthscale = jnp.array([0.263, 0.548, 0.298])
m = m.eval()

prec = sys.argv[1] if len(sys.argv) > 1 else "highest"
def ctx():
    st = contextlib.ExitStack()
    st.enter_context(gp.settings.max_cholesky_size(0))
    if prec == "high":
        st.enter_context(gp.settings.kernel_matvec_high(True))
    else:
        st.enter_context(gp.settings.kernel_matvec_highest(True))
    st.enter_context(gp.settings.eval_cg_tolerance(1e-3))
    st.enter_context(gp.settings.max_preconditioner_size(50))
    st.enter_context(gp.settings.max_cg_iterations(1000))
    st.enter_context(gp.settings.cg_stall_window(50))
    st.enter_context(gp.settings.preconditioner_noise_budget(1e-3))
    st.enter_context(gp.settings.fast_pred_var(True))
    st.enter_context(gp.settings.max_root_decomposition_size(100))
    return st

def sync(v): return float(jnp.sum(v))

T0 = time.perf_counter()
def mark(msg):
    print(f"[+{time.perf_counter()-T0:.1f}s] {msg}", flush=True)

with ctx():
    # (a) preconditioner build alone (train-mode marginal = K + sigma^2 I, lazy kernel)
    mt = m.train()
    mvn = mt.likelihood.marginal(mt.forward(x))
    m = m.eval()
    covar = mvn.lazy_covariance_matrix.evaluate_kernel()
    mark("evaluate_kernel done")
    t0 = time.perf_counter()
    apply_P, P_op, logdet_P = covar._preconditioner()
    mark("preconditioner built (host return)")
    z = apply_P(jnp.ones((N, 1), jnp.float32)) if apply_P is not None else jnp.zeros((1,))
    sync(z)
    print({"precond_build_s": round(time.perf_counter()-t0, 2)}, flush=True)
    # (b) posterior mean at tx (mean cache = one CG solve)
    t0 = time.perf_counter()
    mean = m(tx).mean
    sync(mean)
    print({"mean_solve_s": round(time.perf_counter()-t0, 2)}, flush=True)
    # (c) variance on the SAME strategy (mean cache warm): isolates LOVE root build
    t0 = time.perf_counter()
    v1 = m(tx).variance
    sync(v1)
    print({"var_after_mean_s": round(time.perf_counter()-t0, 2)}, flush=True)
print("COLD DONE", flush=True)
