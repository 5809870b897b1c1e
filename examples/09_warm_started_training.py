"""Warm-started mBCG training (TPU-native extension; no reference-notebook analogue).

Large-N exact-GP training is iteration-bound: each Adam step's mBCG solve costs
(CG iterations) x (one fused kernel matvec).  Because successive Adam steps move the
hyperparameters slowly, CG restarted from the previous step's solutions converges in a
fraction of the iterations.

This example teaches the RECOMMENDED recipe — **rhs-only warm starts** (the bench
default; on-chip validated at N=100k, 2026-08-19: every step runs exactly 10 CG
iterations at 0.605 s/step flat vs the 1.784 s/step cold mean — 2.95x — with RMSE
0.1791 on both validation seeds, identical to the cold control, and marginal NLPD
−0.13/−0.20 vs cold −0.199; pair it with a cosine-decayed learning rate, which is what
keeps the terminal hypers off the constraint floor):

  * the solver state carries ONLY the rhs solve column(s), shape ``(n, 1)`` — the state
    width itself selects the mode (see solvers/inv_quad.py);
  * probe vectors are drawn FRESH every step (plain fresh-key chain — no windows, no
    state resets), with a zero initial guess, so the SLQ tridiagonals stay valid (the
    forward logdet is kept) and there is no frozen-probe gradient bias;
  * only the rhs column gates CG convergence — probe solves are truncated at the
    ``max_lanczos_quadrature_iterations`` floor;
  * ``settings.precond_logdet_vr`` makes that truncation harmless: the logdet gradient
    becomes (analytic d log|P|) + (small stochastic residual), so probe-solve error
    only perturbs the small term.  ``optim.rhs_warm_context`` packages both knobs.

The legacy windowed full-width recipe (``optim.WarmStartSchedule``) is kept at the
bottom for comparison.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.metrics import mean_absolute_error
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
from gpytorch_tpu.models import ExactGP
from gpytorch_tpu.optim import rhs_warm_context

N, N_PROBES = 2000, 8


class GPModel(ExactGP):
    def __init__(self, train_x, train_y, likelihood):
        super().__init__(train_x, train_y, likelihood)
        self.mean_module = ConstantMean()
        self.covar_module = ScaleKernel(RBFKernel())

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def main():
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    train_x = jax.random.uniform(kx, (N,))
    train_y = jnp.sin(train_x * 2 * jnp.pi) + 0.1 * jax.random.normal(ky, (N,))

    model = GPModel(train_x, train_y, GaussianLikelihood())
    params = model.trainable_params()
    opt = optax.adam(0.1)
    opt_state = opt.init(params)
    # rhs-only solver state: just the rhs column — the width selects the mode
    solver_state = jnp.zeros((N, 1), jnp.float32)

    def solver_ctx():
        import contextlib

        st = contextlib.ExitStack()
        st.enter_context(gp.settings.max_cholesky_size(0))   # force mBCG
        st.enter_context(gp.settings.num_trace_samples(N_PROBES))
        st.enter_context(rhs_warm_context(probe_iters=10))   # VR + probe-iteration floor
        return st

    @jax.jit
    def step(p, s, st, key):
        def loss(p):
            m = model.with_params(p)
            with solver_ctx():
                mll = ExactMarginalLogLikelihood(m.likelihood, m)
                val, new_st = mll(m(train_x), train_y, key=key, solver_state=st, return_state=True)
            return -val, new_st

        (l, new_st), g = jax.value_and_grad(loss, has_aux=True)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, new_st, l

    key = jax.random.PRNGKey(100)
    for i in range(60):
        key, sub = jax.random.split(key)       # fresh probes every step — that's it
        params, opt_state, solver_state, l = step(params, opt_state, solver_state, sub)
        if i % 10 == 0:
            print(f"step {i:3d}  -mll/n = {float(l):.4f}")

    model = model.with_params(params).eval()
    test_x = jnp.linspace(0.01, 0.99, 101)
    pred = model.likelihood(model(test_x))
    mae = float(mean_absolute_error(pred, jnp.sin(test_x * 2 * jnp.pi)))
    print(f"test MAE: {mae:.4f}")
    assert mae < 0.1


def main_windowed():
    """The legacy full-width recipe: windowed keys + state resets + skip_logdet_forward
    (optim.WarmStartSchedule packages the discipline).  Prefer main() above."""
    from gpytorch_tpu.optim import WarmStartSchedule

    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    train_x = jax.random.uniform(kx, (N,))
    train_y = jnp.sin(train_x * 2 * jnp.pi) + 0.1 * jax.random.normal(ky, (N,))
    model = GPModel(train_x, train_y, GaussianLikelihood())
    params = model.trainable_params()
    opt = optax.adam(0.1)
    opt_state = opt.init(params)

    def solver_ctx():
        import contextlib

        st = contextlib.ExitStack()
        st.enter_context(gp.settings.max_cholesky_size(0))
        st.enter_context(gp.settings.num_trace_samples(N_PROBES))
        st.enter_context(gp.settings.skip_logdet_forward(True))  # zero-init-free CG
        return st

    @jax.jit
    def step(p, s, st, key):
        def loss(p):
            m = model.with_params(p)
            with solver_ctx():
                mll = ExactMarginalLogLikelihood(m.likelihood, m)
                val, new_st = mll(m(train_x), train_y, key=key, solver_state=st, return_state=True)
            return -val, new_st

        (l, new_st), g = jax.value_and_grad(loss, has_aux=True)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, new_st, l

    schedule = WarmStartSchedule(window=10, seed=100)
    solver_state = schedule.init(N, num_probes=N_PROBES)
    for i in range(60):
        key, solver_state = schedule(i, solver_state)
        params, opt_state, solver_state, l = step(params, opt_state, solver_state, key)
    model = model.with_params(params).eval()
    test_x = jnp.linspace(0.01, 0.99, 101)
    pred = model.likelihood(model(test_x))
    mae = float(mean_absolute_error(pred, jnp.sin(test_x * 2 * jnp.pi)))
    print(f"[windowed] test MAE: {mae:.4f}")
    assert mae < 0.1


if __name__ == "__main__":
    main()
    main_windowed()
