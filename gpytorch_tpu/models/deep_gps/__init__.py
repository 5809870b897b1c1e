import warnings as _warnings

from .deep_gp import DeepGP, DeepGPLayer, DeepLikelihood
from .dspp import DSPP, DSPPLayer


# Deprecated warning shims (reference: gpytorch/models/deep_gps/__init__.py:11-22 —
# "Deprecated for 1.0 release"; kept for 100% public-name parity)
class AbstractDeepGP(DeepGP):
    def __init__(self, *args, **kwargs):
        _warnings.warn("AbstractDeepGP has been renamed to DeepGP.", DeprecationWarning)
        super().__init__(*args, **kwargs)


class AbstractDeepGPLayer(DeepGPLayer):
    def __init__(self, *args, **kwargs):
        _warnings.warn("AbstractDeepGPLayer has been renamed to DeepGPLayer.", DeprecationWarning)
        super().__init__(*args, **kwargs)


__all__ = [
    "AbstractDeepGP",
    "AbstractDeepGPLayer",
    "DSPP",
    "DSPPLayer",
    "DeepGP",
    "DeepGPLayer",
    "DeepLikelihood",
]
