"""SLQ probe-vector PRNG plumbing: fresh probes per call/step, explicit keys under jit,
and the opt-in deterministic_probes mode (reference: linear_operator settings.deterministic_probes,
reached via gpytorch/distributions/multivariate_normal.py:249)."""

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


class _Model(ExactGP):
    def __init__(self, tx, ty, lik):
        super().__init__(tx, ty, lik)
        self.mean_module = ConstantMean()
        self.covar_module = ScaleKernel(RBFKernel())

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (64, 2))
    y = jnp.sin(4 * x[:, 0]) + 0.05 * jax.random.normal(key, (64,))
    model = _Model(x, y, GaussianLikelihood())
    return model, x, y


def _grad_fn(model, x, y):
    def loss(params, key):
        m = model.with_params(params)
        with gp.settings.max_cholesky_size(0), gp.settings.num_trace_samples(4), \
             gp.settings.max_cg_iterations(20), gp.settings.min_preconditioning_size(10**6):
            mll = ExactMarginalLogLikelihood(m.likelihood, m)
            return -mll(m(x), y, key=key)

    return loss


def test_fresh_probes_change_gradients(setup):
    model, x, y = setup
    loss = _grad_fn(model, x, y)
    params = model.trainable_params()
    g1 = jax.grad(loss)(params, jax.random.PRNGKey(1))
    g2 = jax.grad(loss)(params, jax.random.PRNGKey(2))
    diffs = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g1, g2)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0, "distinct probe keys must perturb SLQ grads"


def test_same_key_same_gradients(setup):
    model, x, y = setup
    loss = _grad_fn(model, x, y)
    params = model.trainable_params()
    g1 = jax.grad(loss)(params, jax.random.PRNGKey(7))
    g2 = jax.grad(loss)(params, jax.random.PRNGKey(7))
    jax.tree_util.tree_map(
        lambda a, b: None if jnp.allclose(a, b) else pytest.fail("same key must reproduce grads"),
        g1, g2,
    )


def test_explicit_key_under_jit(setup):
    model, x, y = setup
    loss = _grad_fn(model, x, y)
    params = model.trainable_params()
    jitted = jax.jit(jax.value_and_grad(loss))
    l1, _ = jitted(params, jax.random.PRNGKey(1))
    l2, _ = jitted(params, jax.random.PRNGKey(2))
    assert jnp.isfinite(l1) and jnp.isfinite(l2)
    assert float(l1) != float(l2), "traced key must flow into the probe draw under jit"


def test_deterministic_probes_opt_in(setup):
    model, x, y = setup
    loss = _grad_fn(model, x, y)
    params = model.trainable_params()
    with gp.settings.deterministic_probes(True):
        l1 = loss(params, jax.random.PRNGKey(1))
        l2 = loss(params, jax.random.PRNGKey(2))
    assert float(l1) == float(l2), "deterministic_probes must pin the probe seed"


def test_no_key_fresh_per_call(setup):
    model, x, y = setup
    params = model.trainable_params()

    def loss(params):
        m = model.with_params(params)
        with gp.settings.max_cholesky_size(0), gp.settings.num_trace_samples(4), \
             gp.settings.max_cg_iterations(20), gp.settings.min_preconditioning_size(10**6):
            mll = ExactMarginalLogLikelihood(m.likelihood, m)
            return -mll(m(x), y)

    l1 = float(loss(params))
    l2 = float(loss(params))
    assert l1 != l2, "without a key, successive (untraced) calls must draw fresh probes"


def test_no_key_under_jit_warns_loudly(setup):
    """A jitted objective that draws probes without an explicit key silently freezes them
    into the executable — debug mode must warn at trace time (VERDICT r1 #8; reference
    default is fresh probes every call, linear_operator semantics per SURVEY §2.1b)."""
    import warnings

    from gpytorch_tpu.utils.warnings import TracedProbeKeyWarning

    model, x, y = setup
    params = model.trainable_params()

    @jax.jit
    def loss(params):
        m = model.with_params(params)
        with gp.settings.max_cholesky_size(0), gp.settings.num_trace_samples(4), \
             gp.settings.max_cg_iterations(20), gp.settings.min_preconditioning_size(10**6):
            mll = ExactMarginalLogLikelihood(m.likelihood, m)
            return -mll(m(x), y)  # no key=

    with pytest.warns(TracedProbeKeyWarning):
        loss(params)

    # with an explicit key there is no warning
    loss2 = jax.jit(_grad_fn(model, x, y))
    with warnings.catch_warnings():
        warnings.simplefilter("error", TracedProbeKeyWarning)
        loss2(params, jax.random.PRNGKey(3))


def test_precond_logdet_vr_unbiased_and_lower_variance(setup):
    """Variance-reduced logdet gradients (arXiv 2107.00243, settings.precond_logdet_vr):
    with a pivoted-Cholesky preconditioner active, the VR estimator must stay unbiased
    (mean grad ≈ Cholesky grad) and have materially lower variance than the plain
    Hutchinson form."""
    model, x, y = setup
    params = model.trainable_params()

    def loss(p, key, vr):
        m = model.with_params(p)
        with gp.settings.max_cholesky_size(0), gp.settings.cg_tolerance(1e-10), \
             gp.settings.max_cg_iterations(300), gp.settings.num_trace_samples(8), \
             gp.settings.max_lanczos_quadrature_iterations(25), \
             gp.settings.max_preconditioner_size(8), gp.settings.min_preconditioning_size(8), \
             gp.settings.precond_logdet_vr(vr):
            return -ExactMarginalLogLikelihood(m.likelihood, m)(m(x), y, key=key)

    def loss_chol(p):
        m = model.with_params(p)
        with gp.settings.max_cholesky_size(10**6):
            return -ExactMarginalLogLikelihood(m.likelihood, m)(m(x), y)

    g_exact = jax.grad(loss_chol)(params)
    gfun = jax.jit(jax.grad(loss), static_argnums=(2,))
    name = "likelihood.noise_covar.raw_noise"
    stds, means = {}, {}
    for vr in (False, True):
        vals = np.stack([np.asarray(gfun(params, jax.random.PRNGKey(s), vr)[name]).ravel()
                         for s in range(16)])
        stds[vr], means[vr] = vals.std(0).max(), vals.mean(0)
    ref = np.asarray(g_exact[name]).ravel()
    # unbiased: VR mean within a few VR-standard-errors of the exact gradient
    assert np.all(np.abs(means[True] - ref) < 5 * stds[True] / np.sqrt(16) + 1e-6), (means[True], ref)
    # variance reduction: at least 3x std shrink on the noise gradient (observed ~15x)
    assert stds[True] < stds[False] / 3.0, (stds[True], stds[False])


def test_skip_logdet_forward_lifts_tridiag_floor_keeps_grads(setup):
    """skip_logdet_forward skips only the SLQ forward value: the logdet term drops out of
    the loss VALUE while its gradient (probe-solve based, custom VJP) survives — and the
    n_tridiag minimum-iteration floor is lifted so CG exits purely on convergence
    (reference: linear_operator settings.skip_logdet_forward)."""
    model, x, y = setup
    params = model.trainable_params()

    def loss(params, skip):
        m = model.with_params(params)
        with gp.settings.max_cholesky_size(0), gp.settings.cg_tolerance(1e-10), \
             gp.settings.max_cg_iterations(200), gp.settings.num_trace_samples(8), \
             gp.settings.skip_logdet_forward(skip), gp.settings.min_preconditioning_size(10**9):
            mll = ExactMarginalLogLikelihood(m.likelihood, m)
            return -jnp.sum(mll(m(x), y, key=jax.random.PRNGKey(7)))

    l_full, g_full = jax.value_and_grad(lambda p: loss(p, False))(params)
    l_skip, g_skip = jax.value_and_grad(lambda p: loss(p, True))(params)
    # the forward value differs by exactly the (averaged) logdet contribution
    assert abs(float(l_full) - float(l_skip)) > 1e-3
    # gradients agree: both use the same probe-solve estimator (CG converged at 1e-10,
    # so the lifted iteration floor does not change the solves materially)
    for k in g_full:
        np.testing.assert_allclose(
            np.asarray(g_skip[k]), np.asarray(g_full[k]), rtol=1e-3, atol=1e-6,
            err_msg=f"skip_logdet_forward changed gradient for {k}",
        )
