"""Distributed GP inference over jax.sharding meshes (SURVEY §2.2: the MultiDeviceKernel /
DataParallel analogue, re-designed as collective-aware sharded mBCG)."""

from .mbcg import (
    ShardedMBCGConfig,
    sharded_exact_gp_mll,
    sharded_posterior_mean,
)
from .sharded import (
    ShardedKernel,
    ShardedKernelLinearOperator,
    make_sharded_mll,
    sharded_posterior,
)

__all__ = [
    "ShardedKernel",
    "ShardedKernelLinearOperator",
    "ShardedMBCGConfig",
    "make_sharded_mll",
    "sharded_exact_gp_mll",
    "sharded_posterior",
    "sharded_posterior_mean",
]
