"""General ShardedKernel / ShardedKernelLinearOperator: the full kernel/Module stack
(ARD, ScaleKernel, additive compositions, multitask Kronecker) row-sharded over an
8-device CPU mesh, validated against the single-device dense path (SURVEY §7.10;
reference analogue: gpytorch/kernels/multi_device_kernel.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import gpytorch_tpu as gp
from gpytorch_tpu.distributed import ShardedKernel, make_sharded_mll, sharded_posterior
from gpytorch_tpu.distributions import MultitaskMultivariateNormal, MultivariateNormal
from gpytorch_tpu.kernels import MaternKernel, MultitaskKernel, RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood, MultitaskGaussianLikelihood
from gpytorch_tpu.means import ConstantMean, MultitaskMean
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
from gpytorch_tpu.models import ExactGP


def _mesh():
    devs = np.array(jax.devices())
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return Mesh(devs, ("data",))


N, D = 256, 3


def _data(key=0):
    k = jax.random.PRNGKey(key)
    x = jax.random.normal(k, (N, D))
    y = jnp.sin(2 * x[:, 0]) + 0.3 * x[:, 1] + 0.05 * jax.random.normal(jax.random.PRNGKey(key + 1), (N,))
    return x, y


class _ARDModel(ExactGP):
    """ScaleKernel(RBF-ARD) + Matern — a composition the old hardcoded path couldn't shard."""

    def __init__(self, tx, ty, lik, covar):
        super().__init__(tx, ty, lik)
        self.mean_module = ConstantMean()
        self.covar_module = covar

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def _base_kernel():
    k = ScaleKernel(RBFKernel(ard_num_dims=D)) + MaternKernel(nu=1.5)
    return k


def _init_params(model):
    params = model.trainable_params()
    # non-trivial ARD lengthscales so the test exercises per-dim gradients
    for name in params:
        if "raw_lengthscale" in name:
            params[name] = params[name] + jnp.linspace(-0.3, 0.5, params[name].shape[-1])
    return params


# Medium budget: vs-dense MLL tolerance is 5% and grad rtol 0.2 — 32 probes/30 tridiag at
# n=256 is already well inside that; heavier budgets only inflate compile+run time (this
# file is compile-bound: every shard_map program is its own XLA compile).
_SOLVER = dict(num_probes=32, tridiag=30, cg_iters=150, tol=1e-8)


def _solver_ctx():
    import contextlib

    stack = contextlib.ExitStack()
    stack.enter_context(gp.settings.num_trace_samples(_SOLVER["num_probes"]))
    stack.enter_context(gp.settings.max_lanczos_quadrature_iterations(_SOLVER["tridiag"]))
    stack.enter_context(gp.settings.max_cg_iterations(_SOLVER["cg_iters"]))
    stack.enter_context(gp.settings.cg_tolerance(_SOLVER["tol"]))
    stack.enter_context(gp.settings.min_preconditioning_size(10**9))
    return stack


def _unwrap_names(params):
    """Map sharded-model param names onto the dense model (drop the ShardedKernel level)."""
    return {k.replace("covar_module.base_kernel.", "covar_module."): v for k, v in params.items()}


def _dense_mll_fn(model, x, y):
    def fn(params):
        m = model.with_params(_unwrap_names(params))
        with gp.settings.max_cholesky_size(10**6):
            return ExactMarginalLogLikelihood(m.likelihood, m)(m(x), y)

    return fn


@pytest.fixture(scope="module")
def ard_setup():
    mesh = _mesh()
    x, y = _data()
    model = _ARDModel(x, y, GaussianLikelihood(), ShardedKernel(_base_kernel(), num_devices=8))
    dense_model = _ARDModel(x, y, GaussianLikelihood(), _base_kernel())
    params = _init_params(model)
    return mesh, x, y, model, dense_model, params


@pytest.fixture(scope="module")
def ard_results(ard_setup):
    """ONE value_and_grad program per path (sharded / dense) — each shard_map program is
    a separate XLA compile, so the vs-dense tests share these results instead of tracing
    value-only and grad-only variants separately."""
    mesh, x, y, model, dense_model, params = ard_setup
    with _solver_ctx():
        mll_fn = make_sharded_mll(mesh, model)
        sharded_val, sharded_grad = jax.value_and_grad(
            lambda p: mll_fn(p, x, y, key=jax.random.PRNGKey(0))
        )(params)
    dense_val, dense_grad = jax.value_and_grad(_dense_mll_fn(dense_model, x, y))(params)
    return sharded_val, sharded_grad, dense_val, dense_grad


def test_sharded_ard_mll_matches_dense(ard_results):
    # statistical sanity vs the EXACT Cholesky value: the 5% gate covers SLQ probe
    # variance (different estimator).  The reduction-bug-tight gate is the matched-probe
    # near-exact test below (same estimator, same probes, rtol 1e-5).
    assert (
        abs(float(ard_results[0]) - float(ard_results[2])) / abs(float(ard_results[2])) < 0.05
    ), (float(ard_results[0]), float(ard_results[2]))


def _iter_mll_fn(dense_model, x, y, key):
    """Single-device mBCG MLL with the SAME solver budget and probe key as the sharded
    path under settings.sharded_global_probes — the matched-probe reference."""

    def fn(params):
        m = dense_model.with_params(_unwrap_names(params))
        with _solver_ctx(), gp.settings.max_cholesky_size(0):
            return ExactMarginalLogLikelihood(m.likelihood, m)(m(x), y, key=key)

    return fn


def test_sharded_mll_matched_probes_near_exact(ard_setup):
    """VERDICT r4 ask #5: sharded-vs-unsharded at matched probes is near-EXACT — both
    sides run the same mBCG estimator on the identical probe matrix
    (settings.sharded_global_probes), so only block-summation rounding differs."""
    mesh, x, y, model, dense_model, params = ard_setup
    key = jax.random.PRNGKey(3)
    with _solver_ctx(), gp.settings.sharded_global_probes(True):
        sharded_val, sharded_grad = jax.value_and_grad(
            lambda p: make_sharded_mll(mesh, model)(p, x, y, key=key)
        )(params)
    unsharded_val, unsharded_grad = jax.value_and_grad(_iter_mll_fn(dense_model, x, y, key))(params)
    np.testing.assert_allclose(float(sharded_val), float(unsharded_val), rtol=1e-5)
    for name in unsharded_grad:
        # the mean-constant gradient is a near-total cancellation (1ᵀK̂⁻¹(y−μ) ≈ 0 for
        # centered targets), so CG solve error at tol 1e-8 appears as ABSOLUTE noise
        # there; every other gradient must match to 1e-4 relative
        atol = 3e-3 if name.endswith("raw_constant") else 1e-7
        np.testing.assert_allclose(
            np.asarray(sharded_grad[name]), np.asarray(unsharded_grad[name]),
            rtol=1e-4, atol=atol, err_msg=f"matched-probe grad mismatch for {name}",
        )


def test_sharded_ard_gradients_match_dense(ard_results):
    _, g_sharded, _, g_dense = ard_results
    for name in g_dense:
        np.testing.assert_allclose(
            np.asarray(g_sharded[name]), np.asarray(g_dense[name]), rtol=0.2, atol=0.03,
            err_msg=f"sharded grad mismatch for {name}",
        )


def test_sharded_posterior_matches_dense(ard_setup):
    mesh, x, y, model, dense_model, params = ard_setup
    test_x = jax.random.normal(jax.random.PRNGKey(9), (12, D))
    m = model.with_params(params)
    with _solver_ctx(), gp.settings.eval_cg_tolerance(1e-10):
        post = sharded_posterior(mesh, m, x, y, test_x)

    dm = dense_model.with_params(_unwrap_names(params)).eval()
    with gp.settings.max_cholesky_size(10**6):
        dense_post = dm(test_x)
    np.testing.assert_allclose(np.asarray(post.mean), np.asarray(dense_post.mean), atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(post.covariance_matrix), np.asarray(dense_post.covariance_matrix), atol=5e-3
    )


def test_ring_exchange_matches_all_gather(ard_setup):
    """Ring ppermute vs all_gather: identical probes/trajectories at ANY solver budget
    (only the block-summation order differs), so this uses a light budget and ONE
    value_and_grad program per path (this test was 248 s as four separate programs)."""
    mesh, x, y, model, dense_model, params = ard_setup
    ring_model = _ARDModel(
        x, y, GaussianLikelihood(), ShardedKernel(_base_kernel(), num_devices=8, ring=True)
    )
    with gp.settings.num_trace_samples(8), gp.settings.max_lanczos_quadrature_iterations(10), \
         gp.settings.max_cg_iterations(60), gp.settings.cg_tolerance(1e-8), \
         gp.settings.min_preconditioning_size(10**9):
        ring, g_ring = jax.value_and_grad(
            lambda p: make_sharded_mll(mesh, ring_model)(p, x, y, key=jax.random.PRNGKey(0))
        )(params)
        gathered, g_gather = jax.value_and_grad(
            lambda p: make_sharded_mll(mesh, model)(p, x, y, key=jax.random.PRNGKey(0))
        )(params)
    # identical probes/trajectory; only the block-summation order differs
    np.testing.assert_allclose(float(ring), float(gathered), rtol=1e-5)
    # gradients flow through the ppermute ring (transpose = reverse permute)
    for k in g_ring:
        np.testing.assert_allclose(np.asarray(g_ring[k]), np.asarray(g_gather[k]), atol=1e-6,
                                   err_msg=f"ring grad mismatch for {k}")


class _MTModel(ExactGP):
    def __init__(self, tx, ty, lik, covar):
        super().__init__(tx, ty, lik)
        self.mean_module = MultitaskMean(ConstantMean(), num_tasks=2)
        self.covar_module = covar

    def forward(self, x):
        return MultitaskMultivariateNormal(self.mean_module(x), self.covar_module(x))


def test_sharded_multitask_mll_matches_dense():
    mesh = _mesh()
    x, _ = _data(4)
    y = jnp.stack(
        [jnp.sin(2 * x[:, 0]), jnp.cos(x[:, 1])], axis=-1
    ) + 0.05 * jax.random.normal(jax.random.PRNGKey(5), (N, 2))
    mt_kernel = lambda: MultitaskKernel(RBFKernel(ard_num_dims=D), num_tasks=2, rank=1)
    lik = lambda: MultitaskGaussianLikelihood(num_tasks=2, has_task_noise=False)
    model = _MTModel(x, y, lik(), ShardedKernel(mt_kernel(), num_devices=8))
    dense_model = _MTModel(x, y, lik(), mt_kernel())
    params = _init_params(model)
    with _solver_ctx():
        sharded = make_sharded_mll(mesh, model)(params, x, y, key=jax.random.PRNGKey(0))
    dense = _dense_mll_fn(dense_model, x, y)(params)
    # statistical sanity (SLQ variance) — the reduction-tight gate follows below
    assert abs(float(sharded) - float(dense)) / abs(float(dense)) < 0.05, (float(sharded), float(dense))
    # matched-probe near-exact (VERDICT r4 ask #5): same estimator, identical probes
    key = jax.random.PRNGKey(3)
    with _solver_ctx(), gp.settings.sharded_global_probes(True):
        sharded_mp = make_sharded_mll(mesh, model)(params, x, y, key=key)

    def iter_mll(p):
        m = dense_model.with_params(_unwrap_names(p))
        with _solver_ctx(), gp.settings.max_cholesky_size(0):
            return ExactMarginalLogLikelihood(m.likelihood, m)(m(x), y, key=key)

    np.testing.assert_allclose(float(sharded_mp), float(iter_mll(params)), rtol=1e-5)


# ---------------------------------------------------------------------------------------
# Scale + memory-claim leg (VERDICT r1 #9): N=32k over 8 devices — ring vs all_gather
# equivalence at a size where the sharding does real work, plus a structural check of the
# §5 claim that ring mode never materializes full X/V on any device.
# ---------------------------------------------------------------------------------------


def test_ring_mode_at_scale_and_memory_claim():
    mesh = _mesh()
    n_large, d = 32768, 3
    k = jax.random.PRNGKey(11)
    x = jax.random.normal(k, (n_large, d), dtype=jnp.float32)
    y = jnp.sin(2 * x[:, 0]) + 0.05 * jax.random.normal(jax.random.PRNGKey(12), (n_large,))

    def make(ring):
        model = _ARDModel(
            x, y, GaussianLikelihood(),
            ShardedKernel(ScaleKernel(RBFKernel(ard_num_dims=d)), num_devices=8, ring=ring),
        )
        params = model.trainable_params()
        mll_fn = make_sharded_mll(mesh, model)

        def f(p):
            with gp.settings.max_cholesky_size(0), gp.settings.num_trace_samples(4), \
                 gp.settings.max_cg_iterations(8), gp.settings.max_lanczos_quadrature_iterations(8), \
                 gp.settings.min_preconditioning_size(10**9):
                return -mll_fn(p, x, y, key=jax.random.PRNGKey(0))

        return params, f

    params, f_gather = make(ring=False)
    _, f_ring = make(ring=True)

    lowered_gather = jax.jit(f_gather).lower(params)
    lowered_ring = jax.jit(f_ring).lower(params)
    hlo_gather = lowered_gather.compile().as_text()
    hlo_ring = lowered_ring.compile().as_text()

    # structural memory claim: the gather path all-gathers X/V blocks; ring mode must
    # contain only collective-permutes — no all-gather of a full-N operand anywhere
    assert "all-gather" in hlo_gather
    assert "collective-permute" in hlo_ring
    assert "all-gather" not in hlo_ring, "ring mode must never gather full X/V"

    # equivalence: identical CG trajectory (same probes, same reductions)
    v_gather = float(jax.jit(f_gather)(params))
    v_ring = float(jax.jit(f_ring)(params))
    np.testing.assert_allclose(v_ring, v_gather, rtol=1e-5)

    # peak-memory claim, quantitatively where the backend reports it: ring's per-device
    # temp footprint must not exceed the gather path's (which holds full X + V copies)
    try:
        mem_gather = lowered_gather.compile().memory_analysis()
        mem_ring = lowered_ring.compile().memory_analysis()
        tg = getattr(mem_gather, "temp_size_in_bytes", None)
        tr = getattr(mem_ring, "temp_size_in_bytes", None)
    except Exception:
        tg = tr = None
    if tg and tr:
        assert tr <= tg * 1.05, f"ring temp {tr} should not exceed gather temp {tg}"
