"""BaseMeanTestCase (reference: gpytorch/test/base_mean_test_case.py): forward shapes for
vector / matrix / batch / multi-batch inputs."""

from __future__ import annotations

import jax.numpy as jnp

from .base_test_case import BaseTestCase


class BaseMeanTestCase(BaseTestCase):
    batch_shape = None
    input_dims = 5
    #: outputs per input (>1 for Grad means / multitask means)
    num_outputs = 1

    def create_mean(self, **kwargs):
        raise NotImplementedError

    def _out_shape(self, *lead, n):
        if self.num_outputs == 1:
            return tuple(lead) + (n,)
        return tuple(lead) + (n, self.num_outputs)

    def test_forward_mat(self):
        mean = self.create_mean()
        x = self.randn(4, self.input_dims)
        lead = tuple(self.batch_shape) if self.batch_shape else ()
        assert mean(x).shape == self._out_shape(*lead, n=4)

    def test_forward_mat_batch(self):
        mean = self.create_mean()
        # batched means require a broadcast-compatible data batch (reference
        # base_mean_test_case.py:35 uses the mean's own batch shape)
        batch = tuple(self.batch_shape) if self.batch_shape else (3,)
        x = self.randn(*batch, 4, self.input_dims)
        lead = tuple(jnp.broadcast_shapes(self.batch_shape or (), batch))
        assert mean(x).shape == self._out_shape(*lead, n=4)

    def test_forward_mat_multi_batch(self):
        mean = self.create_mean()
        batch = (2,) + tuple(self.batch_shape) if self.batch_shape else (2, 3)
        x = self.randn(*batch, 4, self.input_dims)
        lead = tuple(jnp.broadcast_shapes(self.batch_shape or (), batch))
        assert mean(x).shape == self._out_shape(*lead, n=4)
