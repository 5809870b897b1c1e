"""PPL hooks (reference: gpytorch/module.py:415-475 pyro_sample_from_prior /
pyro_load_from_samples; models/pyro/pyro_gp.py:11) and verbose_linalg CG observability
(SURVEY §5)."""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpytorch_tpu as gp
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.models import load_from_samples_tree, sample_from_prior_tree
from gpytorch_tpu.priors import GammaPrior
from gpytorch_tpu.solvers.cg import linear_cg


def _prior_kernel():
    return ScaleKernel(
        RBFKernel(lengthscale_prior=GammaPrior(3.0, 6.0)),
        outputscale_prior=GammaPrior(2.0, 0.5),
    )


def test_sample_from_prior_tree_changes_params():
    k = _prior_kernel()
    k1 = sample_from_prior_tree(k, jax.random.PRNGKey(0))
    k2 = sample_from_prior_tree(k, jax.random.PRNGKey(1))
    l1 = float(k1.base_kernel.lengthscale.reshape(-1)[0])
    l2 = float(k2.base_kernel.lengthscale.reshape(-1)[0])
    assert l1 != l2
    assert l1 > 0 and l2 > 0
    # original untouched
    assert float(k.base_kernel.lengthscale.reshape(-1)[0]) == pytest.approx(np.log(2.0), rel=1e-5)


def test_load_from_samples_tree_batches_model():
    k = _prior_kernel()
    samples = {
        "base_kernel.lengthscale_prior": jnp.asarray([[[0.5]], [[1.5]], [[2.5]]]),
        "outputscale_prior": jnp.asarray([1.0, 2.0, 3.0]),
    }
    kb = load_from_samples_tree(k, samples)
    np.testing.assert_allclose(np.asarray(kb.base_kernel.lengthscale[:, 0, 0]), [0.5, 1.5, 2.5], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(kb.outputscale), [1.0, 2.0, 3.0], rtol=1e-5)
    # the batch model evaluates as a batch kernel
    x = jnp.linspace(0, 1, 7)[:, None]
    K = kb(x).evaluate_kernel().to_dense()
    assert K.shape == (3, 7, 7)


def test_load_from_samples_unknown_prior_raises():
    k = _prior_kernel()
    with pytest.raises(RuntimeError, match="no matching prior"):
        load_from_samples_tree(k, {"not.a.prior": jnp.ones(3)})


def test_numpyro_gp_import_guard():
    from gpytorch_tpu.models.pyro import _NUMPYRO_AVAILABLE, NumPyroGP, numpyro_sample_from_prior

    if _NUMPYRO_AVAILABLE:
        pytest.skip("numpyro installed; guard not exercised")
    with pytest.raises(ImportError, match="NumPyro is not installed"):
        numpyro_sample_from_prior(_prior_kernel())


def test_verbose_linalg_logs_cg_stats(caplog):
    K = jnp.eye(32) * 2.0
    rhs = jax.random.normal(jax.random.PRNGKey(0), (32, 2))
    with caplog.at_level(logging.INFO, logger="gpytorch_tpu"):
        with gp.settings.verbose_linalg(True):
            sol = jax.jit(lambda r: linear_cg(lambda v: K @ v, r, max_iter=20, tolerance=1e-10).solution)(rhs)
            sol.block_until_ready()
    np.testing.assert_allclose(np.asarray(sol), np.asarray(rhs) / 2.0, atol=1e-10)
    assert any("linear_cg" in rec.message and "iters" in rec.message for rec in caplog.records)
