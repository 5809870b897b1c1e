"""TPU-native structured linear operator algebra (replaces the external ``linear_operator``
package the reference depends on — see SURVEY.md §2.1)."""

from .base import DenseLinearOperator, LinearOperator, to_dense, to_linear_operator
from .added_diag import AddedDiagLinearOperator
from .block import BlockDiagLinearOperator, BlockInterleavedLinearOperator
from .composition import (
    BatchRepeatLinearOperator,
    CatLinearOperator,
    ConstantMulLinearOperator,
    MaskedLinearOperator,
    MatmulLinearOperator,
    PsdSumLinearOperator,
    SumLinearOperator,
)
from .diag import ConstantDiagLinearOperator, DiagLinearOperator, IdentityLinearOperator
from .interpolated import InterpolatedLinearOperator
from .kronecker import (
    KroneckerProductAddedDiagLinearOperator,
    KroneckerProductDiagLinearOperator,
    KroneckerProductLinearOperator,
)
from .lazy_kernel import LazyEvaluatedKernelOperator
from .root import LowRankRootAddedDiagLinearOperator, LowRankRootLinearOperator, RootLinearOperator
from .toeplitz import ToeplitzLinearOperator
from .triangular import CholLinearOperator, TriangularLinearOperator
from .zero import ZeroLinearOperator

# reference-compatible aliases
LazyEvaluatedKernelTensor = LazyEvaluatedKernelOperator

__all__ = [
    "AddedDiagLinearOperator",
    "BatchRepeatLinearOperator",
    "BlockDiagLinearOperator",
    "BlockInterleavedLinearOperator",
    "CatLinearOperator",
    "CholLinearOperator",
    "ConstantDiagLinearOperator",
    "ConstantMulLinearOperator",
    "DenseLinearOperator",
    "DiagLinearOperator",
    "IdentityLinearOperator",
    "InterpolatedLinearOperator",
    "KroneckerProductAddedDiagLinearOperator",
    "KroneckerProductDiagLinearOperator",
    "KroneckerProductLinearOperator",
    "LazyEvaluatedKernelOperator",
    "LazyEvaluatedKernelTensor",
    "LinearOperator",
    "LowRankRootAddedDiagLinearOperator",
    "LowRankRootLinearOperator",
    "MaskedLinearOperator",
    "MatmulLinearOperator",
    "PsdSumLinearOperator",
    "RootLinearOperator",
    "SumLinearOperator",
    "ToeplitzLinearOperator",
    "TriangularLinearOperator",
    "ZeroLinearOperator",
    "to_dense",
    "to_linear_operator",
]
