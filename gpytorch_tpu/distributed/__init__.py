"""Distributed GP inference over jax.sharding meshes (SURVEY §2.2: the MultiDeviceKernel /
DataParallel analogue, re-designed as collective-aware sharded mBCG)."""

from .mbcg import (
    ShardedMBCGConfig,
    sharded_exact_gp_mll,
    sharded_posterior_mean,
)

__all__ = ["ShardedMBCGConfig", "sharded_exact_gp_mll", "sharded_posterior_mean"]
