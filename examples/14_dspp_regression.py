"""Two-layer DSPP (deep sigma point process) regression with calibrated uncertainty.

Reference workflow: gpytorch/models/deep_gps/dspp.py (DSPPLayer :14, DSPP :98) +
examples/05_Deep_Gaussian_Processes/DSPP_Deep_Sigma_Point_Processes.ipynb — a deep GP
whose layers propagate DETERMINISTIC Gauss-Hermite sigma points instead of Monte-Carlo
samples, with learned softmax quadrature weights.  The loss is
DeepPredictiveLogLikelihood: logsumexp over sites of the per-site marginal
log-likelihood plus the weights (a predictive, PPGPR-style objective).

TPU notes: sigma points make the whole forward pass deterministic given the parameters
— no per-step PRNG plumbing, and the (Q, batch, n) site dimension is a leading batch
axis that XLA vectorizes for free.  The eval-time predictive moments are the
quadrature mixture: mean = Σ_q w_q μ_q, var = Σ_q w_q (σ_q² + μ_q²) − mean².
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean, LinearMean
from gpytorch_tpu.mlls import DeepPredictiveLogLikelihood
from gpytorch_tpu.models import DSPP, DSPPLayer
from gpytorch_tpu.variational import CholeskyVariationalDistribution, VariationalStrategy

Q = 8  # quadrature sites


def make_layer(input_dims, output_dims, m_inducing, mean_type="linear"):
    batch = (output_dims,) if output_dims is not None else ()
    inducing = jax.random.normal(jax.random.PRNGKey(3), batch + (m_inducing, input_dims))

    class Layer(DSPPLayer):
        def __init__(self):
            dist = CholeskyVariationalDistribution(m_inducing, batch_shape=batch)
            strategy = VariationalStrategy(self, inducing, dist, learn_inducing_locations=True,
                                           jitter_val=1e-4)
            super().__init__(strategy, input_dims, output_dims, num_quad_sites=Q)
            self.mean_module = LinearMean(input_dims, batch_shape=batch) \
                if mean_type == "linear" else ConstantMean(batch_shape=batch)
            self.covar_module = ScaleKernel(
                RBFKernel(ard_num_dims=input_dims, batch_shape=batch), batch_shape=batch
            )

        def forward(self, x):
            return MultivariateNormal(self.mean_module(x), self.covar_module(x))

    return Layer()


class TwoLayerDSPP(DSPP):
    def __init__(self, m_inducing):
        super().__init__(num_quad_sites=Q)
        self.hidden = make_layer(1, 2, m_inducing, mean_type="linear")
        self.out = make_layer(2, None, m_inducing, mean_type="constant")
        self.likelihood = GaussianLikelihood()

    def forward(self, x):
        return self.out(self.hidden(x))


def main(quick: bool = False):
    n, m, iters = (96, 12, 200) if quick else (256, 24, 500)
    train_x = jnp.linspace(0, 1, n)[:, None]
    # a step-ish composition target: hard for a single-layer GP, natural for a deep one
    train_y = jnp.sin(train_x[:, 0] * 2 * jnp.pi) * jnp.sign(train_x[:, 0] - 0.5)

    model = TwoLayerDSPP(m)
    _ = model(train_x[:4])  # eager init
    params = model.trainable_params()
    opt = optax.adam(0.05)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m_ = model.with_params(p)
            mll = DeepPredictiveLogLikelihood(m_.likelihood, m_, num_data=n)
            return -mll(m_(train_x), train_y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    for i in range(iters):
        params, state, loss = step(params, state)
        if not quick and i % 100 == 0:
            print(f"iter {i:4d}  loss = {float(loss):.4f}")

    model = model.with_params(params).eval()
    pred = model.likelihood(model(train_x))  # (Q, n) site marginals
    w = jnp.exp(model.quad_weights).reshape(-1, 1)
    mean = jnp.sum(w * pred.mean, axis=0)
    var = jnp.sum(w * (pred.variance + pred.mean**2), axis=0) - mean**2
    mae = float(jnp.mean(jnp.abs(mean - train_y)))
    # calibration: ~all residuals inside 3 mixture stddevs
    cover3 = float(jnp.mean(jnp.abs(mean - train_y) < 3 * jnp.sqrt(var)))
    print(f"DSPP train MAE: {mae:.4f}   3σ coverage: {cover3:.2f}")
    assert mae < (0.2 if quick else 0.1), mae
    assert cover3 > 0.9, cover3
    return mae


if __name__ == "__main__":
    main()
