from .mean import Mean
from .constant_mean import ConstantMean
from .linear_mean import LinearMean
from .multitask_mean import MultitaskMean
from .zero_mean import ZeroMean
from .grad_means import (
    ConstantMeanGrad,
    ConstantMeanGradGrad,
    LinearMeanGrad,
    LinearMeanGradGrad,
)

__all__ = [
    "ConstantMean",
    "ConstantMeanGrad",
    "ConstantMeanGradGrad",
    "LinearMean",
    "LinearMeanGrad",
    "LinearMeanGradGrad",
    "Mean",
    "MultitaskMean",
    "ZeroMean",
]
