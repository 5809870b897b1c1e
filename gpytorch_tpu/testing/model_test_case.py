"""BaseModelTestCase / VariationalModelTestCase (reference:
gpytorch/test/model_test_case.py:12,94): forward in train/eval mode across batch shapes,
and gradient presence through the training objective (the JAX analogue of the reference's
``backward`` checks: ``jax.grad`` of the MLL must be finite and not all-zero)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..distributions import MultivariateNormal
from .base_test_case import BaseTestCase


class BaseModelTestCase(BaseTestCase):
    def create_model(self, train_x, train_y, likelihood):
        raise NotImplementedError

    def create_test_data(self, batch_shape=()):
        raise NotImplementedError

    def create_likelihood_and_labels(self, batch_shape=()):
        raise NotImplementedError

    def create_batch_test_data(self, batch_shape=(3,)):
        return self.create_test_data(batch_shape)

    def _make(self, batch_shape=()):
        x = self.create_test_data(batch_shape)
        likelihood, y = self.create_likelihood_and_labels(batch_shape)
        model = self.create_model(x, y, likelihood)
        return model, x, y, likelihood

    def test_forward_train(self):
        model, x, y, _ = self._make()
        model.train()
        out = model(x)
        assert isinstance(out, MultivariateNormal)
        assert out.lazy_covariance_matrix.matrix_shape[-1] >= x.shape[-2]

    def test_batch_forward_train(self):
        model, x, y, _ = self._make((3,))
        model.train()
        out = model(x)
        assert isinstance(out, MultivariateNormal)

    def test_forward_eval(self):
        model, x, y, _ = self._make()
        model.eval()
        out = model(self.create_test_data(()))
        assert isinstance(out, MultivariateNormal)
        assert bool(jnp.all(jnp.isfinite(out.mean)))
        assert bool(jnp.all(out.variance >= -1e-6))

    def test_backward_train(self):
        model, x, y, likelihood = self._make()
        model.train()
        params = model.trainable_params()

        def loss_fn(p):
            m = model.with_params(p)
            return -jnp.sum(self.compute_mll(m, m.likelihood if hasattr(m, "likelihood") else likelihood, x, y))

        grads = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves), "non-finite gradients"
        assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves), "all-zero gradients"

    def compute_mll(self, model, likelihood, x, y):
        raise NotImplementedError


class VariationalModelTestCase(BaseModelTestCase):
    """Adds variational-specific checks (reference model_test_case.py:94-151)."""

    def test_eval_covar_is_psd(self):
        model, x, y, _ = self._make()
        model.eval()
        out = model(self.create_test_data(()))
        cov = out.lazy_covariance_matrix.to_dense()
        eigs = jnp.linalg.eigvalsh(cov + 1e-4 * jnp.eye(cov.shape[-1], dtype=cov.dtype))
        assert float(jnp.min(eigs)) > -1e-3
