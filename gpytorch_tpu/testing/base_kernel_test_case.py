"""BaseKernelTestCase — ~15 inherited property tests applied to every kernel
(reference: gpytorch/test/base_kernel_test_case.py:13; every file in test/kernels/
subclasses it).  Subclasses provide ``create_kernel_no_ard`` (and optionally
``create_kernel_ard``)."""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import pytest

from .base_test_case import BaseTestCase


class BaseKernelTestCase(BaseTestCase):
    def create_kernel_no_ard(self, **kwargs):
        raise NotImplementedError

    def create_kernel_ard(self, num_dims: int, **kwargs):
        raise NotImplementedError

    #: input dimensionality for non-batch data (kernels over structured inputs override)
    input_dims = 10
    #: input dimensionality for batch data
    batch_input_dims = 2
    #: set False for kernels whose outputs are not plain n×n (e.g. derivative kernels)
    supports_diag = True
    #: set False for dimension-fixed kernels (spectral mixture, index, ...) where slicing
    #: active dims changes the required constructor arguments
    supports_active_dims = True
    #: set False for kernels that are not PSD over generic R^d inputs (e.g. Cosine over
    #: Euclidean distance in d > 1 — same caveat as the reference CosineKernel)
    check_psd = True

    def create_data_no_batch(self):
        return self.randn(50, self.input_dims)

    def create_data_single_batch(self):
        return self.randn(2, 3, self.batch_input_dims)

    def create_data_double_batch(self):
        return self.randn(3, 2, 50, self.batch_input_dims)

    def _ard_or_skip(self, num_dims, **kwargs):
        try:
            kernel = self.create_kernel_ard(num_dims=num_dims, **kwargs)
        except NotImplementedError:
            pytest.skip("kernel does not support ARD")
        if kernel is None:
            pytest.skip("kernel does not support ARD")
        return kernel

    # -- active dims (reference :30-48) ---------------------------------------------------
    def test_active_dims_list(self):
        if not self.supports_active_dims:
            pytest.skip("dimension-fixed kernel")
        try:
            kernel = self.create_kernel_no_ard(active_dims=(0, 2, 4, 6))
        except TypeError:
            pytest.skip("kernel does not accept active_dims")
        x = self.create_data_no_batch()
        covar_mat = kernel(x).evaluate_kernel().to_dense()
        kernel_basic = self.create_kernel_no_ard()
        covar_mat_actual = kernel_basic(x[:, (0, 2, 4, 6)]).evaluate_kernel().to_dense()
        self.assertAllClose(covar_mat, covar_mat_actual, rtol=1e-3, atol=1e-5)

    def test_active_dims_range(self):
        if not self.supports_active_dims:
            pytest.skip("dimension-fixed kernel")
        active_dims = tuple(range(3, 9))
        try:
            kernel = self.create_kernel_no_ard(active_dims=active_dims)
        except TypeError:
            pytest.skip("kernel does not accept active_dims")
        x = self.create_data_no_batch()
        covar_mat = kernel(x).evaluate_kernel().to_dense()
        kernel_basic = self.create_kernel_no_ard()
        covar_mat_actual = kernel_basic(x[:, active_dims]).evaluate_kernel().to_dense()
        self.assertAllClose(covar_mat, covar_mat_actual, rtol=1e-3, atol=1e-5)

    # -- batch broadcasting (reference :49-126) ---------------------------------------------
    def _check_batch(self, kernel, x):
        batch_covar = kernel(x).evaluate_kernel().to_dense()
        flat_x = x.reshape((-1,) + x.shape[-2:])
        flat_batch = batch_covar.reshape((-1,) + batch_covar.shape[-2:])
        for i in range(flat_x.shape[0]):
            actual = kernel(flat_x[i]).evaluate_kernel().to_dense()
            # batched kernel params broadcast: take the matching batch slice if present
            act = actual if actual.ndim == 2 else actual.reshape((-1,) + actual.shape[-2:])[i % actual.shape[0]]
            self.assertAllClose(flat_batch[i], act, rtol=1e-3, atol=1e-5)
        if self.supports_diag:
            diag = kernel(x, diag=True)
            self.assertAllClose(
                diag, jnp.diagonal(batch_covar, axis1=-2, axis2=-1), rtol=1e-3, atol=1e-5
            )

    def test_no_batch_kernel_single_batch_x_no_ard(self):
        self._check_batch(self.create_kernel_no_ard(), self.create_data_single_batch())

    def test_no_batch_kernel_double_batch_x_no_ard(self):
        self._check_batch(self.create_kernel_no_ard(), self.create_data_double_batch())

    def test_no_batch_kernel_double_batch_x_ard(self):
        kernel = self._ard_or_skip(num_dims=self.batch_input_dims)
        self._check_batch(kernel, self.create_data_double_batch())

    def test_smoke_single_batch_kernel_single_batch_x_no_ard(self):
        try:
            kernel = self.create_kernel_no_ard(batch_shape=(2,))
        except TypeError:
            pytest.skip("kernel does not accept batch_shape")
        x = self.create_data_single_batch()
        o = kernel.num_outputs_per_input(x, x)
        out = kernel(x).evaluate_kernel().to_dense()
        n = x.shape[-2]
        assert out.shape[-3:] == (2, n * o, n * o)

    def test_smoke_double_batch_kernel_double_batch_x_no_ard(self):
        try:
            kernel = self.create_kernel_no_ard(batch_shape=(3, 2))
        except TypeError:
            pytest.skip("kernel does not accept batch_shape")
        x = self.create_data_double_batch()
        o = kernel.num_outputs_per_input(x, x)
        out = kernel(x).evaluate_kernel().to_dense()
        n = x.shape[-2]
        assert out.shape[-4:] == (3, 2, n * o, n * o)

    def test_smoke_double_batch_kernel_double_batch_x_ard(self):
        kernel = self._ard_or_skip(num_dims=self.batch_input_dims, batch_shape=(3, 2))
        x = self.create_data_double_batch()
        o = kernel.num_outputs_per_input(x, x)
        out = kernel(x).evaluate_kernel().to_dense()
        n = x.shape[-2]
        assert out.shape[-4:] == (3, 2, n * o, n * o)

    # -- cross covariance & symmetry -------------------------------------------------------
    def test_cross_covar_shape_and_symmetry(self):
        kernel = self.create_kernel_no_ard()
        x1 = self.randn(6, self.input_dims)
        x2 = self.randn(4, self.input_dims)
        K12 = kernel(x1, x2).evaluate_kernel().to_dense()
        K21 = kernel(x2, x1).evaluate_kernel().to_dense()
        o = kernel.num_outputs_per_input(x1, x2)
        assert K12.shape[-2:] == (6 * o, 4 * o)
        self.assertAllClose(K12, jnp.swapaxes(K21, -1, -2), rtol=1e-3, atol=1e-4)

    def test_kernel_symmetric_psd(self):
        kernel = self.create_kernel_no_ard()
        x = self.randn(20, self.input_dims)
        K = kernel(x).evaluate_kernel().to_dense()
        self.assertAllClose(K, jnp.swapaxes(K, -1, -2), rtol=1e-3, atol=1e-4)
        if self.check_psd:
            eigs = jnp.linalg.eigvalsh(K + 1e-4 * jnp.eye(K.shape[-1], dtype=K.dtype))
            assert float(jnp.min(eigs)) > -1e-3, f"kernel matrix not PSD (min eig {float(jnp.min(eigs))})"

    # -- getitem (reference :143-178) ----------------------------------------------------------
    def test_kernel_getitem_single_batch(self):
        try:
            kernel = self.create_kernel_no_ard(batch_shape=(2,))
        except TypeError:
            pytest.skip("kernel does not accept batch_shape")
        x = self.create_data_single_batch()
        res1 = kernel(x).evaluate_kernel().to_dense()[0]
        new_kernel = kernel[0]
        res2 = new_kernel(x[0]).evaluate_kernel().to_dense()
        self.assertAllClose(res1, res2, rtol=1e-3, atol=1e-5)

    # -- serialization (reference :179) -----------------------------------------------------
    def test_kernel_pickle_unpickle(self):
        kernel = self.create_kernel_no_ard()
        x = self.create_data_no_batch()
        before = kernel(x).evaluate_kernel().to_dense()
        clone = pickle.loads(pickle.dumps(kernel))
        after = clone(x).evaluate_kernel().to_dense()
        self.assertAllClose(before, after, rtol=1e-6, atol=1e-7)

    # -- state dict round trip --------------------------------------------------------------
    def test_kernel_state_dict_roundtrip(self):
        kernel = self.create_kernel_no_ard()
        sd = kernel.state_dict()
        clone = self.create_kernel_no_ard()
        clone.load_state_dict(sd)
        x = self.randn(8, self.input_dims)
        self.assertAllClose(
            kernel(x).evaluate_kernel().to_dense(), clone(x).evaluate_kernel().to_dense(),
            rtol=1e-6, atol=1e-7,
        )
