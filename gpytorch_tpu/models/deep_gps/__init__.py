from .deep_gp import DeepGP, DeepGPLayer, DeepLikelihood
from .dspp import DSPP, DSPPLayer

__all__ = ["DSPP", "DSPPLayer", "DeepGP", "DeepGPLayer", "DeepLikelihood"]
