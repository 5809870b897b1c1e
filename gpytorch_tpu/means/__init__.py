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


# -- reference one-file-per-mean import paths ---------------------------------------------
from .._submodule_alias import install_submodule_aliases as _install

_install(__name__, {
    "mean": {"Mean": Mean},
    "zero_mean": {"ZeroMean": ZeroMean},
    "constant_mean": {"ConstantMean": ConstantMean},
    "linear_mean": {"LinearMean": LinearMean},
    "multitask_mean": {"MultitaskMean": MultitaskMean},
    "constant_mean_grad": {"ConstantMeanGrad": ConstantMeanGrad},
    "constant_mean_gradgrad": {"ConstantMeanGradGrad": ConstantMeanGradGrad},
    "linear_mean_grad": {"LinearMeanGrad": LinearMeanGrad},
    "linear_mean_gradgrad": {"LinearMeanGradGrad": LinearMeanGradGrad},
})
