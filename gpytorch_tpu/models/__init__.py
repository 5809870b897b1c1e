from .approximate_gp import ApproximateGP
from .deep_gps import DSPP, DSPPLayer, DeepGP, DeepGPLayer
from .exact_gp import ExactGP
from .gp import GP
from .gplvm import (
    BayesianGPLVM,
    LatentVariable,
    MAPLatentVariable,
    PointLatentVariable,
    VariationalLatentVariable,
)
from .model_list import AbstractModelList, IndependentModelList

__all__ = [
    "AbstractModelList",
    "ApproximateGP",
    "BayesianGPLVM",
    "DSPP",
    "DSPPLayer",
    "DeepGP",
    "DeepGPLayer",
    "ExactGP",
    "GP",
    "IndependentModelList",
    "LatentVariable",
    "MAPLatentVariable",
    "PointLatentVariable",
    "VariationalLatentVariable",
]
