"""SLQ probe-vector PRNG plumbing: fresh probes per call/step, explicit keys under jit,
and the opt-in deterministic_probes mode (reference: linear_operator settings.deterministic_probes,
reached via gpytorch/distributions/multivariate_normal.py:249)."""

import jax
import jax.numpy as jnp
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
