from .approximate_gp import ApproximateGP
from .deep_gps import DSPP, DSPPLayer, DeepGP, DeepGPLayer
from .exact_gp import ExactGP
from .gp import GP
from .model_list import AbstractModelList, IndependentModelList

__all__ = [
    "AbstractModelList",
    "ApproximateGP",
    "DSPP",
    "DSPPLayer",
    "DeepGP",
    "DeepGPLayer",
    "ExactGP",
    "GP",
    "IndependentModelList",
]
