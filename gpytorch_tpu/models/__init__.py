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
from .pyro import NumPyroGP, PyroGP, load_from_samples_tree, sample_from_prior_tree

# deprecated aliases (reference models/__init__.py:15-31)
VariationalGP = ApproximateGP


class AbstractVariationalGP(ApproximateGP):
    def __init__(self, *args, **kwargs):
        import warnings

        warnings.warn("AbstractVariationalGP has been renamed to ApproximateGP.", DeprecationWarning)
        super().__init__(*args, **kwargs)


class PyroVariationalGP(ApproximateGP):
    # reference models/__init__.py:27-31: deprecated rename shim
    def __init__(self, *args, **kwargs):
        import warnings

        warnings.warn("PyroVariationalGP has been renamed to PyroGP.", DeprecationWarning)
        super().__init__(*args, **kwargs)


__all__ = [
    "AbstractVariationalGP",
    "PyroVariationalGP",
    "VariationalGP",
    "deep_gps",
    "exact_prediction_strategies",
    "gplvm",
    "pyro",
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
    "NumPyroGP",
    "PyroGP",
    "load_from_samples_tree",
    "sample_from_prior_tree",
    "MAPLatentVariable",
    "PointLatentVariable",
    "VariationalLatentVariable",
]
