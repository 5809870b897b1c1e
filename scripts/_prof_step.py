"""Dissect the N=100k train step: per-matvec cost by precision mode at T=32,
forward-only vs value_and_grad, and CG-iteration scaling."""
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
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood

N, D = 100000, 3

@jax.jit
def _make_data():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (N, D), jnp.float32)
    f = jnp.sin(4*x[:,0])*jnp.cos(3*x[:,1]) + 0.5*jnp.sin(7*x[:,2]*x[:,0]) + 0.1*x[:,2]
    y = f + 0.1*jax.random.normal(jax.random.PRNGKey(1), (N,))
    return x, (y - y.mean())/y.std()

x, y = _make_data()

class Model(ExactGP):
    def __init__(s, a, b, lik):
        super().__init__(a, b, lik)
        s.mean_module = ConstantMean(); s.covar_module = ScaleKernel(RBFKernel(ard_num_dims=D))
    def forward(s, xx): return MultivariateNormal(s.mean_module(xx), s.covar_module(xx))

lik = GaussianLikelihood()
m = Model(x, y, lik)
# timed-window-ish hypers (early training)
m.likelihood.noise = 0.05
m.covar_module.outputscale = 0.8
m.covar_module.base_kernel.lengthscale = jnp.array([0.45, 0.5, 0.45])

def sync(v): return float(jnp.sum(v))

# --- raw fused matvec cost by mode at T in {8, 32} ---
from gpytorch_tpu.ops import pallas_kernels as pk
for T in (8, 32):
    V = jax.random.normal(jax.random.PRNGKey(3), (N, T), jnp.float32)
    for mode in ("bf16", "high", "highest"):
        st = contextlib.ExitStack()
        st.enter_context(gp.settings.use_pallas(True))
        if mode == "bf16":
            st.enter_context(gp.settings.kernel_matvec_bf16(True))
        elif mode == "high":
            st.enter_context(gp.settings.kernel_matvec_bf16(False))
            st.enter_context(gp.settings.kernel_matvec_high(True))
        else:
            st.enter_context(gp.settings.kernel_matvec_bf16(False))
            st.enter_context(gp.settings.kernel_matvec_highest(True))
        with st:
            kern = m.covar_module
            op = kern(x)  # lazy
            mv = jax.jit(lambda v: op.evaluate_kernel()._matmul(v))
            sync(mv(V))
            t0 = time.perf_counter(); sync(mv(V)); t1 = time.perf_counter()
            sync(mv(V)); t2 = time.perf_counter()
            print({"matvec_mode": mode, "T": T, "ms": round(min(t1-t0, t2-t1)*1e3, 1)})

# --- full step: forward-only vs grad ---
def solver_ctx():
    st = contextlib.ExitStack()
    st.enter_context(gp.settings.max_cholesky_size(0))
    st.enter_context(gp.settings.max_cg_iterations(100))
    st.enter_context(gp.settings.cg_tolerance(1.0))
    st.enter_context(gp.settings.num_trace_samples(31))
    st.enter_context(gp.settings.max_lanczos_quadrature_iterations(5))
    st.enter_context(gp.settings.max_preconditioner_size(50))
    st.enter_context(gp.settings.cg_stall_window(5))
    st.enter_context(gp.settings.preconditioner_noise_budget(1e-3))
    st.enter_context(gp.settings.use_pallas(True))
    st.enter_context(gp.settings.kernel_matvec_bf16(False))
    st.enter_context(gp.settings.kernel_matvec_high(True))
    return st

params = m.trainable_params()
def loss_fn(p, k):
    mm = m.with_params(p)
    mm.train_inputs = (x,); mm.train_targets = y
    with solver_ctx():
        return -ExactMarginalLogLikelihood(mm.likelihood, mm)(mm(x), y, key=k)

fwd = jax.jit(loss_fn)
vg = jax.jit(lambda p, k: jax.value_and_grad(loss_fn)(p, k))
k0 = jax.random.PRNGKey(7)
sync(fwd(params, k0))
t0 = time.perf_counter(); sync(fwd(params, k0)); t1 = time.perf_counter()
sync(fwd(params, k0)); t2 = time.perf_counter()
print({"forward_only_s": round(min(t1-t0, t2-t1), 3)}, flush=True)
l, g = vg(params, k0); sync(l)
t0 = time.perf_counter(); l, g = vg(params, k0); sync(l); t1 = time.perf_counter()
l, g = vg(params, k0); sync(l); t2 = time.perf_counter()
print({"value_and_grad_s_early": round(min(t1-t0, t2-t1), 3)}, flush=True)

# hardened late-training system (bench-final-like hypers): iteration count and step cost
m.likelihood.noise = 0.0172
m.covar_module.outputscale = 1.98
m.covar_module.base_kernel.lengthscale = jnp.array([0.263, 0.548, 0.298])
params_late = m.trainable_params()
l, g = vg(params_late, k0); sync(l)
t0 = time.perf_counter(); l, g = vg(params_late, k0); sync(l); t1 = time.perf_counter()
l, g = vg(params_late, k0); sync(l); t2 = time.perf_counter()
print({"value_and_grad_s_late": round(min(t1-t0, t2-t1), 3)}, flush=True)
print("STEP PROF DONE")
