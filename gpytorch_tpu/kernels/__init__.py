from .kernel import AdditiveKernel, Kernel, ProductKernel
from .grad_kernels import (
    Matern52KernelGrad,
    PolynomialKernelGrad,
    RBFKernelGrad,
    RBFKernelGradGrad,
)
from .grid_interpolation_kernel import GridInterpolationKernel
from .grid_kernel import GridKernel
from .index_kernel import IndexKernel
from .inducing_point_kernel import InducingPointKernel
from .linear_kernel import LinearKernel, PolynomialKernel
from .misc_kernels import (
    ArcKernel,
    CylindricalKernel,
    DistributionalInputKernel,
    GaussianSymmetrizedKLKernel,
    GibbsKernel,
    HammingIMQKernel,
    SphericalLinearKernel,
)
from .multitask_kernel import LCMKernel, MultitaskKernel
from .piecewise_polynomial_kernel import PiecewisePolynomialKernel
from .rff_kernel import RFFKernel
from .scale_kernel import ConstantKernel, ScaleKernel
from .spectral_delta_kernel import SpectralDeltaKernel
from .spectral_mixture_kernel import SpectralMixtureKernel
from .stationary import CosineKernel, MaternKernel, PeriodicKernel, RBFKernel, RQKernel
from .structure_kernels import (
    AdditiveStructureKernel,
    NewtonGirardAdditiveKernel,
    ProductStructureKernel,
)

__all__ = [
    "AdditiveKernel",
    "AdditiveStructureKernel",
    "ArcKernel",
    "ConstantKernel",
    "CosineKernel",
    "CylindricalKernel",
    "DistributionalInputKernel",
    "GaussianSymmetrizedKLKernel",
    "GibbsKernel",
    "GridInterpolationKernel",
    "GridKernel",
    "HammingIMQKernel",
    "IndexKernel",
    "InducingPointKernel",
    "Kernel",
    "LCMKernel",
    "LinearKernel",
    "Matern52KernelGrad",
    "MaternKernel",
    "MultitaskKernel",
    "NewtonGirardAdditiveKernel",
    "PeriodicKernel",
    "PiecewisePolynomialKernel",
    "PolynomialKernel",
    "PolynomialKernelGrad",
    "ProductKernel",
    "ProductStructureKernel",
    "RBFKernel",
    "RBFKernelGrad",
    "RBFKernelGradGrad",
    "RFFKernel",
    "RQKernel",
    "ScaleKernel",
    "SphericalLinearKernel",
    "SpectralDeltaKernel",
    "SpectralMixtureKernel",
]


def __getattr__(name):
    if name == "keops":
        # reference kernels/keops/ (C++/CUDA streaming matvecs); here the fused Pallas
        # path is the default, so these are aliases (lazy import keeps startup cheap;
        # importlib avoids `from . import` re-entering this __getattr__)
        import importlib

        return importlib.import_module(".keops", __name__)
    if name == "MultiDeviceKernel":
        # reference kernels/multi_device_kernel.py:14 (torch DataParallel scatter/gather);
        # the TPU-native equivalent is the mesh-sharded collective kernel (lazy import to
        # avoid a circular kernels <-> distributed dependency)
        from ..distributed import ShardedKernel

        return ShardedKernel
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
