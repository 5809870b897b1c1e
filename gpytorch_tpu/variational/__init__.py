from ._variational_distribution import (
    CholeskyVariationalDistribution,
    DeltaVariationalDistribution,
    MeanFieldVariationalDistribution,
    _VariationalDistribution,
)
from ._variational_strategy import _VariationalStrategy
from .natural_variational_distribution import (
    _NaturalVariationalDistribution,
    NaturalVariationalDistribution,
    TrilNaturalVariationalDistribution,
)
from .multitask_variational_strategies import (
    IndependentMultitaskVariationalStrategy,
    LMCVariationalStrategy,
)
from .variational_strategy import UnwhitenedVariationalStrategy, VariationalStrategy
from .ciq_variational_strategy import CiqVariationalStrategy
from .decoupled_variational_strategies import (
    BatchDecoupledVariationalStrategy,
    OrthogonallyDecoupledVariationalStrategy,
)
from .grid_interpolation_variational_strategy import (
    AdditiveGridInterpolationVariationalStrategy,
    GridInterpolationVariationalStrategy,
)
from .large_batch_variational_strategy import LargeBatchVariationalStrategy
from .nearest_neighbor_variational_strategy import NNVariationalStrategy

# backwards-compat alias matching the reference deprecation
MultitaskVariationalStrategy = IndependentMultitaskVariationalStrategy

__all__ = [
    "AdditiveGridInterpolationVariationalStrategy",
    "BatchDecoupledVariationalStrategy",
    "CholeskyVariationalDistribution",
    "CiqVariationalStrategy",
    "DeltaVariationalDistribution",
    "GridInterpolationVariationalStrategy",
    "IndependentMultitaskVariationalStrategy",
    "LMCVariationalStrategy",
    "LargeBatchVariationalStrategy",
    "MeanFieldVariationalDistribution",
    "MultitaskVariationalStrategy",
    "NNVariationalStrategy",
    "NaturalVariationalDistribution",
    "_NaturalVariationalDistribution",
    "OrthogonallyDecoupledVariationalStrategy",
    "TrilNaturalVariationalDistribution",
    "UnwhitenedVariationalStrategy",
    "VariationalStrategy",
    "_VariationalDistribution",
    "_VariationalStrategy",
]


# -- reference one-file-per-strategy import paths -----------------------------------------
from .._submodule_alias import install_submodule_aliases as _install

_install(__name__, {
    "additive_grid_interpolation_variational_strategy": {
        "AdditiveGridInterpolationVariationalStrategy": AdditiveGridInterpolationVariationalStrategy
    },
    "batch_decoupled_variational_strategy": {
        "BatchDecoupledVariationalStrategy": BatchDecoupledVariationalStrategy
    },
    "cholesky_variational_distribution": {
        "CholeskyVariationalDistribution": CholeskyVariationalDistribution
    },
    "delta_variational_distribution": {"DeltaVariationalDistribution": DeltaVariationalDistribution},
    "independent_multitask_variational_strategy": {
        "IndependentMultitaskVariationalStrategy": IndependentMultitaskVariationalStrategy,
        "MultitaskVariationalStrategy": MultitaskVariationalStrategy,
    },
    "lmc_variational_strategy": {"LMCVariationalStrategy": LMCVariationalStrategy},
    "mean_field_variational_distribution": {
        "MeanFieldVariationalDistribution": MeanFieldVariationalDistribution
    },
    "orthogonally_decoupled_variational_strategy": {
        "OrthogonallyDecoupledVariationalStrategy": OrthogonallyDecoupledVariationalStrategy
    },
    "tril_natural_variational_distribution": {
        "TrilNaturalVariationalDistribution": TrilNaturalVariationalDistribution
    },
    "unwhitened_variational_strategy": {
        "UnwhitenedVariationalStrategy": UnwhitenedVariationalStrategy
    },
})
