"""BaseKeOpsTestCase (reference: gpytorch/test/base_keops_test_case.py): asserts the
"KeOps" kernel (here: the fused Pallas streaming path) matches the plain kernel.  On
non-TPU backends the fused path falls back to the identical jnp reference math, so the
check is exact; on TPU it validates the streaming tiles against the dense kernel."""

from __future__ import annotations

import jax.numpy as jnp

from .. import settings
from .base_test_case import BaseTestCase


class BaseKeOpsTestCase(BaseTestCase):
    #: plain kernel class
    k1 = None
    #: keops (fused) kernel class
    k2 = None
    kernel_kwargs: dict = {}

    def _pair(self, ard=False):
        kw = dict(self.kernel_kwargs)
        if ard:
            kw["ard_num_dims"] = 3
        return type(self).k1(**kw), type(self).k2(**kw)

    def _check(self, x1, x2, ard=False):
        kern1, kern2 = self._pair(ard)
        with settings.use_keops(True):
            d1 = kern1(x1, x2).evaluate_kernel().to_dense()
            d2 = kern2(x1, x2).evaluate_kernel().to_dense()
        self.assertAllClose(d1, d2, rtol=1e-4, atol=1e-5)

    def test_forward_x1_eq_x2(self):
        x = self.randn(32, 3)
        self._check(x, x)

    def test_forward_x1_eq_x2_ard(self):
        x = self.randn(32, 3)
        self._check(x, x, ard=True)

    def test_forward_x1_neq_x2(self):
        self._check(self.randn(32, 3), self.randn(18, 3))

    def test_forward_x1_neq_x2_ard(self):
        self._check(self.randn(32, 3), self.randn(18, 3), ard=True)
