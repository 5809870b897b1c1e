from .kernel import AdditiveKernel, Kernel, ProductKernel
from .linear_kernel import LinearKernel, PolynomialKernel
from .scale_kernel import ConstantKernel, ScaleKernel
from .stationary import CosineKernel, MaternKernel, PeriodicKernel, RBFKernel, RQKernel

__all__ = [
    "AdditiveKernel",
    "ConstantKernel",
    "CosineKernel",
    "Kernel",
    "LinearKernel",
    "MaternKernel",
    "PeriodicKernel",
    "PolynomialKernel",
    "ProductKernel",
    "RBFKernel",
    "RQKernel",
    "ScaleKernel",
]
