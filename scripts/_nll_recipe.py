import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import contextlib, sys, time
import jax, jax.numpy as jnp
import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.metrics import negative_log_predictive_density
from gpytorch_tpu.models import ExactGP

noise, outputscale = float(sys.argv[1]), float(sys.argv[2])
ls = [float(a) for a in sys.argv[3:6]]
tol = float(sys.argv[6]) if len(sys.argv) > 6 else 1e-4
N, N_TEST, D = 100_000, 2048, 3
key = jax.random.PRNGKey(0)
all_x = jax.random.uniform(key, (N + N_TEST, D), dtype=jnp.float32)
f = (jnp.sin(4*all_x[:,0])*jnp.cos(3*all_x[:,1]) + 0.5*jnp.sin(7*all_x[:,2]*all_x[:,0]) + 0.1*all_x[:,2])
all_y = f + 0.1*jax.random.normal(jax.random.PRNGKey(1), (N+N_TEST,), dtype=jnp.float32)
all_y = (all_y - jnp.mean(all_y)) / jnp.std(all_y)
train_x, train_y, test_x, test_y = all_x[:N], all_y[:N], all_x[N:], all_y[N:]

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
st.enter_context(gp.settings.max_preconditioner_size(50))
st.enter_context(gp.settings.max_cg_iterations(1000))
st.enter_context(gp.settings.cg_stall_window(50))
st.enter_context(gp.settings.preconditioner_noise_budget(1e-3))
st.enter_context(gp.settings.fast_pred_var(False))
st.enter_context(gp.settings.eval_cg_tolerance(tol))
with st:
    t0 = time.time()
    pred = model.likelihood(model(test_x))
    cov = pred.lazy_covariance_matrix.to_dense()
    cov = 0.5*(cov+cov.T)
    w = jnp.linalg.eigvalsh(cov)
    print(f"tol={tol:g} eig range [{float(w[0]):.3e}, {float(w[-1]):.3e}] n_neg={int(jnp.sum(w<0))} n_below_noise={int(jnp.sum(w<noise))} ({time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    nll = float(negative_log_predictive_density(pred, test_y, eig_floor=noise))
    print(f"joint NLPD eig-floor: {nll:.4f} ({time.time()-t0:.0f}s)", flush=True)
    nll2 = float(negative_log_predictive_density(pred, test_y, eig_floor=noise))
    print(f"repeat (determinism): {nll2:.4f}", flush=True)
