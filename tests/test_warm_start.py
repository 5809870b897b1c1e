"""Warm-started mBCG solves across optimizer steps (TPU-native extension).

With ``settings.deterministic_probes`` (same probe vectors every call — reference
linear_operator setting) and ``settings.skip_logdet_forward`` (no Lanczos tridiagonals, so
a nonzero CG initial guess is valid), the training solves can start from the previous
Adam step's solutions: successive steps move the hypers slowly, so CG converges in a
fraction of the iterations.  The state threads through ``mll(..., solver_state=st,
return_state=True)`` like optimizer state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
from gpytorch_tpu.models import ExactGP
from gpytorch_tpu.solvers.cg import linear_cg


def _model(n=300, d=2, seed=0):
    kx, ky = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.uniform(kx, (n, d), dtype=jnp.float32)
    y = jnp.sin(4 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), dtype=jnp.float32)

    class M(ExactGP):
        def __init__(self, tx, ty, lik):
            super().__init__(tx, ty, lik)
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel(ard_num_dims=d))

        def forward(self, xx):
            return MultivariateNormal(self.mean_module(xx), self.covar_module(xx))

    m = M(x, y, GaussianLikelihood())
    return m, x, y


def _ctx():
    import contextlib

    st = contextlib.ExitStack()
    st.enter_context(gp.settings.max_cholesky_size(0))
    st.enter_context(gp.settings.skip_logdet_forward(True))
    st.enter_context(gp.settings.deterministic_probes(True))
    st.enter_context(gp.settings.num_trace_samples(8))
    st.enter_context(gp.settings.max_cg_iterations(400))
    st.enter_context(gp.settings.cg_tolerance(1e-3))
    st.enter_context(gp.settings.cg_stall_window(40))
    return st


def test_warm_start_cg_iteration_count_drops():
    """A CG solve restarted from its own solution converges almost immediately.

    Tolerance 1e-3, not 1e-6: in f32 the recurrence residual drifts from the true residual
    near the round-off floor, so a warm restart (which re-anchors to the TRUE residual)
    cannot reach a tolerance the cold run only nominally hit.  Training tolerances are loose
    (stagnation-dominated), which is exactly the regime warm starting targets."""
    m, x, y = _model()
    with _ctx():
        covar = m.likelihood.marginal(m(x)).lazy_covariance_matrix.evaluate_kernel()
        rhs = jax.random.normal(jax.random.PRNGKey(3), (x.shape[0], 4), dtype=jnp.float32)
        apply_P, _, _ = covar._preconditioner()
        cold = linear_cg(covar._matmul, rhs, precond_fn=apply_P, tolerance=1e-3)
        warm = linear_cg(covar._matmul, rhs, precond_fn=apply_P, tolerance=1e-3, x0=cold.solution)
    assert int(warm.num_iters) <= max(3, int(cold.num_iters) // 4), (
        int(cold.num_iters), int(warm.num_iters))
    np.testing.assert_allclose(np.asarray(warm.solution), np.asarray(cold.solution), rtol=1e-2, atol=1e-3)


def test_mll_state_roundtrip_and_value_parity():
    """(loss, state) API: warm call at the same params reproduces the cold loss and grads."""
    m, x, y = _model()
    mll = ExactMarginalLogLikelihood(m.likelihood, m)
    params = m.trainable_params()

    def loss_fn(p, st):
        mm = m.with_params(p)
        with _ctx():
            mll2 = ExactMarginalLogLikelihood(mm.likelihood, mm)
            val, new_st = mll2(mm(x), y, solver_state=st, return_state=True)
        return -val, new_st

    (l0, st1), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params, None)
    assert st1.shape[-1] == 1 + 8  # rhs column + 8 probes
    (l1, st2), g1 = jax.value_and_grad(loss_fn, has_aux=True)(params, st1)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-4)


def test_warm_training_matches_cold_training():
    """A short warm-started Adam run lands at the same hypers as the cold-solve run."""
    import optax

    m, x, y = _model(n=240)
    params0 = m.trainable_params()
    opt = optax.adam(0.1)

    def make_step(warm: bool):
        def step(carry, _):
            p, s, st = carry
            def loss(p):
                mm = m.with_params(p)
                with _ctx():
                    mll = ExactMarginalLogLikelihood(mm.likelihood, mm)
                    val, new_st = mll(mm(x), y, solver_state=st if warm else None, return_state=True)
                return -val, new_st
            (l, new_st), g = jax.value_and_grad(loss, has_aux=True)(p)
            u, s = opt.update(g, s)
            return (optax.apply_updates(p, u), s, new_st), l
        return step

    def run(warm):
        p, s = params0, opt.init(params0)
        st = jnp.zeros((x.shape[0], 9), jnp.float32)
        step = make_step(warm)
        for i in range(20):
            (p, s, st), l = step((p, s, st), None)
        return p, float(l)

    p_cold, l_cold = run(False)
    p_warm, l_warm = run(True)
    # same probes (deterministic), warm solves converge to the same solutions -> same trajectory
    for a, b in zip(jax.tree_util.tree_leaves(p_cold), jax.tree_util.tree_leaves(p_warm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-3)


def test_warm_start_requires_skip_logdet_forward():
    m, x, y = _model(n=64)
    mll = ExactMarginalLogLikelihood(m.likelihood, m)
    st = jnp.zeros((x.shape[0], 9), jnp.float32)
    with gp.settings.max_cholesky_size(0), gp.settings.num_trace_samples(8), \
         pytest.raises(ValueError, match="skip_logdet_forward"):
        mll(m(x), y, solver_state=st, return_state=True)


def test_sharded_warm_start_parity():
    """Warm-started sharded mBCG: same value as the cold sharded call; row-sharded state."""
    import numpy as np_
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gpytorch_tpu.distributed import ShardedKernel, make_sharded_mll

    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("data",))
    n = 64 * n_dev
    kx, ky = jax.random.split(jax.random.PRNGKey(5))
    x = jax.random.uniform(kx, (n, 2), dtype=jnp.float32)
    y = jnp.sin(4 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), dtype=jnp.float32)

    class M(ExactGP):
        def __init__(self, tx, ty, lik):
            super().__init__(tx, ty, lik)
            self.mean_module = ConstantMean()
            self.covar_module = ShardedKernel(ScaleKernel(RBFKernel(ard_num_dims=2)), num_devices=n_dev)

        def forward(self, xx):
            return MultivariateNormal(self.mean_module(xx), self.covar_module(xx))

    m = M(x, y, GaussianLikelihood())
    params = m.trainable_params()
    with _ctx():
        mll_fn = make_sharded_mll(mesh, m)
        cold = float(mll_fn(params, x, y, key=jax.random.PRNGKey(1)))
        st0 = jnp.zeros((n, 9), jnp.float32)
        v1, st1 = mll_fn(params, x, y, key=jax.random.PRNGKey(1), solver_state=st0, return_state=True)
        assert st1.shape == (n, 9)
        v2, st2 = mll_fn(params, x, y, key=jax.random.PRNGKey(1), solver_state=st1, return_state=True)
    np.testing.assert_allclose(float(v1), cold, rtol=1e-4)
    np.testing.assert_allclose(float(v2), cold, rtol=1e-3)


def test_warm_start_schedule_discipline():
    """WarmStartSchedule: constant key within a window, fresh across, reset at boundaries."""
    from gpytorch_tpu.optim import WarmStartSchedule

    sched = WarmStartSchedule(window=5, seed=11)
    st = sched.init(32, num_probes=4)
    assert st.shape == (32, 5)
    st_mid = st + 1.0
    k0, s0 = sched(0, st_mid)
    assert float(jnp.sum(jnp.abs(s0))) == 0.0          # boundary: reset
    k1, s1 = sched(1, st_mid)
    assert float(jnp.sum(jnp.abs(s1 - st_mid))) == 0.0  # mid-window: passthrough
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))  # same window key
    k5, s5 = sched(5, st_mid)
    assert float(jnp.sum(jnp.abs(s5))) == 0.0          # next boundary: reset
    assert not np.array_equal(np.asarray(k0), np.asarray(k5))      # fresh window key


def test_warm_schedule_end_to_end_matches_cold():
    """Training driven by WarmStartSchedule lands where the cold-solve run lands."""
    import optax

    from gpytorch_tpu.optim import WarmStartSchedule

    m, x, y = _model(n=240)
    params0 = m.trainable_params()
    opt = optax.adam(0.1)

    def make_step(warm: bool):
        @jax.jit
        def step(p, s, k, st):
            def loss(p):
                mm = m.with_params(p)
                with _ctx():
                    mll = ExactMarginalLogLikelihood(mm.likelihood, mm)
                    val, new_st = mll(mm(x), y, key=k, solver_state=st if warm else None,
                                      return_state=True)
                return -val, new_st
            (l, new_st), g = jax.value_and_grad(loss, has_aux=True)(p)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, new_st, l
        return step

    sched = WarmStartSchedule(window=5, seed=3)

    def run(warm):
        p, s = params0, opt.init(params0)
        st = sched.init(x.shape[0], num_probes=8)
        step = make_step(warm)
        for i in range(20):
            k, st = sched(i, st)
            p, s, st, l = step(p, s, k, st)
        return p

    p_cold = run(False)
    p_warm = run(True)
    for a, b in zip(jax.tree_util.tree_leaves(p_cold), jax.tree_util.tree_leaves(p_warm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-3)


# ---------------------------------------------------------------- rhs-only warm mode
# State carries ONLY the rhs solve columns; probes are fresh (zero x0, valid tridiags,
# forward logdet kept) and truncated at the iterations the warm rhs needed.


def _ctx_rhs():
    import contextlib

    st = contextlib.ExitStack()
    st.enter_context(gp.settings.max_cholesky_size(0))
    st.enter_context(gp.settings.num_trace_samples(8))
    st.enter_context(gp.settings.max_lanczos_quadrature_iterations(10))
    st.enter_context(gp.settings.max_cg_iterations(400))
    st.enter_context(gp.settings.cg_tolerance(1e-3))
    st.enter_context(gp.settings.cg_stall_window(40))
    return st


def test_rhs_only_warm_keeps_forward_logdet_and_matches_cold():
    """Same key + converged rhs state => identical probes, near-identical loss AND grads,
    with the forward SLQ logdet present (unlike full-width warm, which requires
    skip_logdet_forward)."""
    m, x, y = _model()
    params = m.trainable_params()

    def loss_fn(p, st, k):
        mm = m.with_params(p)
        with _ctx_rhs():
            mll2 = ExactMarginalLogLikelihood(mm.likelihood, mm)
            val, new_st = mll2(mm(x), y, key=k, solver_state=st, return_state=True)
        return -val, new_st

    k = jax.random.PRNGKey(42)
    st0 = jnp.zeros((x.shape[0], 1), jnp.float32)  # rhs-only width
    (l0, st1), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params, st0, k)
    assert st1.shape == (x.shape[0], 1)
    (l1, st2), g1 = jax.value_and_grad(loss_fn, has_aux=True)(params, st1, k)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-4)
    # the forward value includes the logdet: must match the plain cold mll
    mm = m.with_params(params)
    with _ctx_rhs():
        mll_cold = ExactMarginalLogLikelihood(mm.likelihood, mm)
        l_cold = -mll_cold(mm(x), y, key=k)
    np.testing.assert_allclose(float(l0), float(l_cold), rtol=1e-4)


def test_rhs_only_warm_truncates_probe_iterations():
    """With a converged rhs x0 and conv_cols=1, the joint CG stops at the tridiag floor
    instead of running the probe columns to tolerance."""
    m, x, y = _model()
    with _ctx_rhs():
        covar = m.likelihood.marginal(m(x)).lazy_covariance_matrix.evaluate_kernel()
        apply_P, _, _ = covar._preconditioner()
        rhs = (y - jnp.mean(y))[:, None]
        probes = jax.random.normal(jax.random.PRNGKey(3), (x.shape[0], 8), jnp.float32)
        cold = linear_cg(covar._matmul, jnp.concatenate([rhs, probes], -1),
                         precond_fn=apply_P, tolerance=1e-3, n_tridiag_iter=10)
        x0 = jnp.concatenate([cold.solution[:, :1], jnp.zeros_like(probes)], -1)
        warm = linear_cg(covar._matmul, jnp.concatenate([rhs, probes], -1),
                         precond_fn=apply_P, tolerance=1e-3, n_tridiag_iter=10,
                         x0=x0, conv_cols=1)
    assert int(warm.num_iters) <= max(11, int(cold.num_iters) // 2), (
        int(cold.num_iters), int(warm.num_iters))
    # rhs solution still converged
    np.testing.assert_allclose(np.asarray(warm.solution[:, 0]),
                               np.asarray(cold.solution[:, 0]), rtol=1e-2, atol=1e-3)


def test_rhs_only_warm_training_matches_cold():
    """Adam with rhs-only warm state + per-step fresh keys lands where cold training lands
    (no windowed keys, no state zeroing, no skip_logdet_forward)."""
    import optax

    m, x, y = _model(n=240)
    params0 = m.trainable_params()
    opt = optax.adam(0.1)

    def make_step(warm: bool):
        @jax.jit
        def step(p, s, k, st):
            def loss(p):
                mm = m.with_params(p)
                with _ctx_rhs(), gp.settings.precond_logdet_vr(True):
                    mll = ExactMarginalLogLikelihood(mm.likelihood, mm)
                    val, new_st = mll(mm(x), y, key=k, solver_state=st if warm else None,
                                      return_state=True)
                return -val, new_st
            (l, new_st), g = jax.value_and_grad(loss, has_aux=True)(p)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, new_st, l
        return step

    def run(warm):
        p, s = params0, opt.init(params0)
        st = jnp.zeros((x.shape[0], 1), jnp.float32)
        key = jax.random.PRNGKey(17)
        step = make_step(warm)
        for i in range(20):
            key, sub = jax.random.split(key)
            p, s, st, l = step(p, s, sub, st)
        return p
    p_cold = run(False)
    p_warm = run(True)
    for a, b in zip(jax.tree_util.tree_leaves(p_cold), jax.tree_util.tree_leaves(p_warm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-3)


def test_bad_state_width_raises():
    m, x, y = _model(n=64)
    mll = ExactMarginalLogLikelihood(m.likelihood, m)
    st = jnp.zeros((x.shape[0], 5), jnp.float32)  # neither 1 (rhs) nor 9 (full)
    with gp.settings.max_cholesky_size(0), gp.settings.num_trace_samples(8), \
         pytest.raises(ValueError, match="columns"):
        mll(m(x), y, solver_state=st, return_state=True)


def test_lagged_rhs_init_matches_standard_warm():
    """settings.cg_lagged_rhs folds the warm-start residual matvec into iteration 1
    (forced alpha=1, beta=0 on the gated column): solution parity with the standard
    warm path, IDENTICAL probe tridiagonals, and zero-x0 (first step) safety."""
    m, x, y = _model()
    with _ctx_rhs():
        covar = m.likelihood.marginal(m(x)).lazy_covariance_matrix.evaluate_kernel()
        apply_P, _, _ = covar._preconditioner()
        rhs = (y - jnp.mean(y))[:, None]
        probes = jax.random.normal(jax.random.PRNGKey(3), (x.shape[0], 8), jnp.float32)
        b = jnp.concatenate([rhs, probes], -1)
        cold = linear_cg(covar._matmul, b, precond_fn=apply_P, tolerance=1e-4,
                         n_tridiag_iter=10)
        x0 = jnp.concatenate([cold.solution[:, :1] * 1.001, jnp.zeros_like(probes)], -1)
        std = linear_cg(covar._matmul, b, precond_fn=apply_P, tolerance=1e-4,
                        n_tridiag_iter=10, x0=x0, conv_cols=1)
        lag = linear_cg(covar._matmul, b, precond_fn=apply_P, tolerance=1e-4,
                        n_tridiag_iter=10, x0=x0, conv_cols=1, lagged_rhs_init=True)
    # probe tridiagonals: bit-identical (the lagged column does not touch probe algebra)
    np.testing.assert_array_equal(np.asarray(std.alphas[:, 1:]), np.asarray(lag.alphas[:, 1:]))
    np.testing.assert_array_equal(np.asarray(std.betas[:, 1:]), np.asarray(lag.betas[:, 1:]))
    # rhs solution parity
    np.testing.assert_allclose(np.asarray(lag.solution[:, 0]), np.asarray(std.solution[:, 0]),
                               rtol=1e-3, atol=1e-4)
    # zero x0 (the first training step's state) must behave as a cold solve
    with _ctx_rhs():
        lag0 = linear_cg(covar._matmul, b, precond_fn=apply_P, tolerance=1e-4,
                         n_tridiag_iter=10, x0=jnp.zeros_like(b), conv_cols=1,
                         lagged_rhs_init=True)
    np.testing.assert_allclose(np.asarray(lag0.solution[:, 0]), np.asarray(cold.solution[:, 0]),
                               rtol=1e-2, atol=1e-3)


def test_lagged_rhs_mll_training_value_parity():
    """End-to-end: the rhs-warm MLL under settings.cg_lagged_rhs matches the standard
    warm MLL at the same key/state (value and gradients)."""
    m, x, y = _model()
    params = m.trainable_params()

    def loss_fn(p, st, k, lagged):
        mm = m.with_params(p)
        with _ctx_rhs(), gp.settings.cg_lagged_rhs(lagged):
            mll2 = ExactMarginalLogLikelihood(mm.likelihood, mm)
            val, new_st = mll2(mm(x), y, key=k, solver_state=st, return_state=True)
        return -val, new_st

    k = jax.random.PRNGKey(42)
    st0 = jnp.zeros((x.shape[0], 1), jnp.float32)
    # one cold-ish call to obtain a converged warm state
    (_, st1), _ = jax.value_and_grad(loss_fn, has_aux=True)(params, st0, k, False)
    (l_std, _), g_std = jax.value_and_grad(loss_fn, has_aux=True)(params, st1, k, False)
    (l_lag, _), g_lag = jax.value_and_grad(loss_fn, has_aux=True)(params, st1, k, True)
    np.testing.assert_allclose(float(l_lag), float(l_std), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_std), jax.tree_util.tree_leaves(g_lag)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-4)
