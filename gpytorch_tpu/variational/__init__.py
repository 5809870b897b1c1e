from ._variational_distribution import (
    CholeskyVariationalDistribution,
    DeltaVariationalDistribution,
    MeanFieldVariationalDistribution,
    _VariationalDistribution,
)
from ._variational_strategy import _VariationalStrategy
from .natural_variational_distribution import (
    NaturalVariationalDistribution,
    TrilNaturalVariationalDistribution,
)
from .multitask_variational_strategies import (
    IndependentMultitaskVariationalStrategy,
    LMCVariationalStrategy,
)
from .variational_strategy import UnwhitenedVariationalStrategy, VariationalStrategy

# backwards-compat alias matching the reference deprecation
MultitaskVariationalStrategy = IndependentMultitaskVariationalStrategy

__all__ = [
    "CholeskyVariationalDistribution",
    "DeltaVariationalDistribution",
    "IndependentMultitaskVariationalStrategy",
    "LMCVariationalStrategy",
    "MeanFieldVariationalDistribution",
    "MultitaskVariationalStrategy",
    "NaturalVariationalDistribution",
    "TrilNaturalVariationalDistribution",
    "UnwhitenedVariationalStrategy",
    "VariationalStrategy",
    "_VariationalDistribution",
    "_VariationalStrategy",
]
