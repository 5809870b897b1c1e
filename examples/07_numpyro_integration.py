"""Sampling GP hyperparameters with NumPyro
(reference: examples/07_Pyro_Integration/GP_Regression_with_Uncertain_Inputs...; the
module-level hooks mirror gpytorch/module.py:415-475 `pyro_sample_from_prior`).

Requires numpyro; gracefully skips if not installed (it is optional, like the reference's
pyro). The pure-JAX `sample_from_prior_tree` path runs regardless.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import jax.numpy as jnp

from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.models import ExactGP, sample_from_prior_tree
from gpytorch_tpu.priors import GammaPrior, UniformPrior


class GPModel(ExactGP):
    def __init__(self, train_x, train_y, likelihood):
        super().__init__(train_x, train_y, likelihood)
        self.mean_module = ConstantMean()
        kernel = RBFKernel(lengthscale_prior=UniformPrior(0.05, 1.0))
        self.covar_module = ScaleKernel(kernel, outputscale_prior=GammaPrior(2.0, 2.0))

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def main():
    train_x = jnp.linspace(0, 1, 50)
    train_y = jnp.sin(train_x * 2 * jnp.pi) + 0.1 * jax.random.normal(jax.random.PRNGKey(0), (50,))
    model = GPModel(train_x, train_y, GaussianLikelihood())

    # pure-JAX prior sampling (no PPL needed): returns a model with parameters drawn
    # from their registered priors
    sampled = sample_from_prior_tree(model, jax.random.PRNGKey(1))
    print("prior-sampled lengthscale:",
          float(jnp.reshape(sampled.covar_module.base_kernel.lengthscale, (-1,))[0]))

    # batch-evaluate the model under a dictionary of posterior samples (MCMC output shape):
    # load_from_samples_tree turns a scalar-hyperparameter model into a batched one
    from gpytorch_tpu.models import load_from_samples_tree

    samples = {
        "covar_module.base_kernel.lengthscale_prior": jnp.asarray([[[0.2]], [[0.4]], [[0.6]]]),
        "covar_module.outputscale_prior": jnp.asarray([0.5, 1.0, 2.0]),
    }
    batched = load_from_samples_tree(model, samples)
    K = batched.covar_module(train_x[:, None]).evaluate_kernel().to_dense()
    print("batched kernel over 3 hyperparameter samples:", K.shape)

    from gpytorch_tpu.models.pyro import _NUMPYRO_AVAILABLE, numpyro_sample_from_prior

    if not _NUMPYRO_AVAILABLE:
        print("numpyro not installed — skipping PPL sampling (optional, like reference pyro)")
        return
    import numpyro

    with numpyro.handlers.seed(rng_seed=2):
        sampled = numpyro_sample_from_prior(model)
    print("numpyro prior-sampled lengthscale:",
          float(jnp.reshape(sampled.covar_module.base_kernel.lengthscale, (-1,))[0]))


if __name__ == "__main__":
    main()
