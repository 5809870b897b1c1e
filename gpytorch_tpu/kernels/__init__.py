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
    hamming_dist,
    project_onto_unit_sphere,
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
from .stationary import postprocess_rbf, CosineKernel, MaternKernel, PeriodicKernel, RBFKernel, RQKernel
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


# -- reference one-file-per-kernel import paths (gpytorch/kernels/<name>_kernel.py) -------
from .._submodule_alias import install_submodule_aliases as _install

_install(__name__, {
    "additive_structure_kernel": {"AdditiveStructureKernel": AdditiveStructureKernel},
    "arc_kernel": {"ArcKernel": ArcKernel},
    "constant_kernel": {"ConstantKernel": ConstantKernel},
    "cosine_kernel": {"CosineKernel": CosineKernel},
    "cylindrical_kernel": {"CylindricalKernel": CylindricalKernel},
    "distributional_input_kernel": {"DistributionalInputKernel": DistributionalInputKernel},
    "gaussian_symmetrized_kl_kernel": {"GaussianSymmetrizedKLKernel": GaussianSymmetrizedKLKernel},
    "gibbs_kernel": {"GibbsKernel": GibbsKernel},
    "hamming_kernel": {"HammingIMQKernel": HammingIMQKernel, "hamming_dist": hamming_dist},
    "kernel": {"Kernel": Kernel, "AdditiveKernel": AdditiveKernel, "ProductKernel": ProductKernel},
    "lcm_kernel": {"LCMKernel": LCMKernel},
    "matern52_kernel_grad": {"Matern52KernelGrad": Matern52KernelGrad},
    "matern_kernel": {"MaternKernel": MaternKernel},
    "newton_girard_additive_kernel": {"NewtonGirardAdditiveKernel": NewtonGirardAdditiveKernel},
    "periodic_kernel": {"PeriodicKernel": PeriodicKernel},
    "polynomial_kernel": {"PolynomialKernel": PolynomialKernel},
    "polynomial_kernel_grad": {"PolynomialKernelGrad": PolynomialKernelGrad},
    "product_structure_kernel": {"ProductStructureKernel": ProductStructureKernel},
    "rbf_kernel": {"RBFKernel": RBFKernel, "postprocess_rbf": postprocess_rbf},
    "rbf_kernel_grad": {"RBFKernelGrad": RBFKernelGrad},
    "rbf_kernel_gradgrad": {"RBFKernelGradGrad": RBFKernelGradGrad},
    "rq_kernel": {"RQKernel": RQKernel},
    "spherical_linear_kernel": {
        "SphericalLinearKernel": SphericalLinearKernel,
        "project_onto_unit_sphere": project_onto_unit_sphere,
    },
    "scale_kernel": {"ScaleKernel": ScaleKernel},
    "linear_kernel": {"LinearKernel": LinearKernel},
    "index_kernel": {"IndexKernel": IndexKernel},
    "multitask_kernel": {"MultitaskKernel": MultitaskKernel},
    "grid_kernel": {"GridKernel": GridKernel},
    "grid_interpolation_kernel": {"GridInterpolationKernel": GridInterpolationKernel},
    "inducing_point_kernel": {"InducingPointKernel": InducingPointKernel},
    "rff_kernel": {"RFFKernel": RFFKernel},
    "spectral_mixture_kernel": {"SpectralMixtureKernel": SpectralMixtureKernel},
    "spectral_delta_kernel": {"SpectralDeltaKernel": SpectralDeltaKernel},
    "piecewise_polynomial_kernel": {"PiecewisePolynomialKernel": PiecewisePolynomialKernel},
})

# multi_device_kernel resolves lazily (kernels <-> distributed circular import — same
# reason as the package-level __getattr__ above)
import sys as _sys
import types as _types


def _mdk_getattr(name):
    if name == "MultiDeviceKernel":
        from ..distributed import ShardedKernel

        return ShardedKernel
    raise AttributeError(name)


_mdk = _types.ModuleType(__name__ + ".multi_device_kernel",
                         "Alias of the mesh-sharded kernel under the reference path.")
_mdk.__getattr__ = _mdk_getattr
_sys.modules[_mdk.__name__] = _mdk
del _mdk, _sys, _types
