"""Isolate the per-step FIXED costs of the N=100k training step (the warm-bench finding:
4 CG iters still cost 0.57 s/step → ~0.45 s is iteration-independent).

Suspects: rank-50 pivoted-Cholesky preconditioner build (50 sequential kernel-row steps),
probe sampling from P, the fused BBMM backward pass, Adam/param plumbing."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import contextlib, time
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

m = Model(x, y, GaussianLikelihood())
m.likelihood.noise = 0.05
m.covar_module.outputscale = 0.8
m.covar_module.base_kernel.lengthscale = jnp.array([0.45, 0.5, 0.45])
params = m.trainable_params()

def sync(v): return float(jnp.sum(jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), v, 0.0)))

def ctx(pc=50, probes=31, maxiter=100):
    st = contextlib.ExitStack()
    for c in (gp.settings.max_cholesky_size(0), gp.settings.max_cg_iterations(maxiter),
              gp.settings.cg_tolerance(1.0), gp.settings.num_trace_samples(probes),
              gp.settings.max_lanczos_quadrature_iterations(5),
              gp.settings.max_preconditioner_size(pc), gp.settings.cg_stall_window(5),
              gp.settings.preconditioner_noise_budget(1e-3), gp.settings.use_pallas(True),
              gp.settings.kernel_matvec_bf16(False), gp.settings.kernel_matvec_high(True)):
        st.enter_context(c)
    return st

def timeit(tag, fn, *a):
    sync(fn(*a))
    t0 = time.perf_counter(); sync(fn(*a)); t1 = time.perf_counter()
    sync(fn(*a)); t2 = time.perf_counter()
    print({tag: round(min(t1-t0, t2-t1), 4)}, flush=True)

# 1. preconditioner build alone (rank 50)
def pbuild(p):
    mm = m.with_params(p); mm.train_inputs = (x,); mm.train_targets = y
    with ctx():
        covar = mm.likelihood.marginal(mm(x)).lazy_covariance_matrix.evaluate_kernel()
        apply_P, P_op, logdet_P = covar._preconditioner()
        return logdet_P
timeit("pc_build_rank50_s", jax.jit(pbuild), params)

# 2. build + probe sampling from P
def pprobe(p, k):
    mm = m.with_params(p); mm.train_inputs = (x,); mm.train_targets = y
    with ctx():
        covar = mm.likelihood.marginal(mm(x)).lazy_covariance_matrix.evaluate_kernel()
        apply_P, P_op, logdet_P = covar._preconditioner()
        z = P_op.zero_mean_mvn_samples(jax.random.PRNGKey(3), 31)
        return jnp.sum(z) + logdet_P
timeit("pc_build_plus_probes_s", jax.jit(pprobe), params, 0)

# 3. forward-only mll, pc=50 vs pc=0, maxiter clamped to 4 (isolates non-CG cost)
def fwd(pc, maxiter, p, k):
    mm = m.with_params(p); mm.train_inputs = (x,); mm.train_targets = y
    with ctx(pc=pc, maxiter=maxiter):
        return -ExactMarginalLogLikelihood(mm.likelihood, mm)(mm(x), y, key=k)
k0 = jax.random.PRNGKey(7)
timeit("fwd_pc50_it4_s", jax.jit(lambda p, k: fwd(50, 4, p, k)), params, k0)
timeit("fwd_pc0_it4_s", jax.jit(lambda p, k: fwd(0, 4, p, k)), params, k0)
timeit("fwd_pc50_it100_s", jax.jit(lambda p, k: fwd(50, 100, p, k)), params, k0)

# 4. value_and_grad at maxiter=4: (vg - fwd) ≈ backward fixed cost
timeit("vg_pc50_it4_s", jax.jit(lambda p, k: jax.value_and_grad(lambda pp, kk: fwd(50, 4, pp, kk))(p, k)), params, k0)
print("FIXED PROF DONE", flush=True)
