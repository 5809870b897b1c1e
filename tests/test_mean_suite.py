"""Apply the shipped BaseMeanTestCase harness across the mean inventory
(reference pattern: the 8 files in test/means/)."""

import jax.numpy as jnp
import pytest

import gpytorch_tpu.means as M
from gpytorch_tpu.testing import BaseMeanTestCase


class TestZeroMean(BaseMeanTestCase):
    def create_mean(self):
        return M.ZeroMean()


class TestConstantMean(BaseMeanTestCase):
    def create_mean(self):
        return M.ConstantMean()


class TestConstantMeanBatch(BaseMeanTestCase):
    batch_shape = (2,)

    def create_mean(self):
        return M.ConstantMean(batch_shape=(2,))


class TestLinearMean(BaseMeanTestCase):
    def create_mean(self):
        return M.LinearMean(input_size=self.input_dims)


class TestMultitaskMean(BaseMeanTestCase):
    num_outputs = 3

    def create_mean(self):
        return M.MultitaskMean(M.ConstantMean(), num_tasks=3)


class TestConstantMeanGrad(BaseMeanTestCase):
    num_outputs = 6  # value + d gradients

    def create_mean(self):
        return M.ConstantMeanGrad()


class TestConstantMeanGradGrad(BaseMeanTestCase):
    num_outputs = 11  # value + d grads + d gradgrads

    def create_mean(self):
        return M.ConstantMeanGradGrad()


class TestLinearMeanGrad(BaseMeanTestCase):
    num_outputs = 6

    def create_mean(self):
        return M.LinearMeanGrad(input_size=self.input_dims)


class TestLinearMeanGradGrad(BaseMeanTestCase):
    num_outputs = 11

    def create_mean(self):
        return M.LinearMeanGradGrad(input_size=self.input_dims)
