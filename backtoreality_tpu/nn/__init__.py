"""PointNet++ neural layers (channels-last, flax.linen)."""

from backtoreality_tpu.nn.norm import BatchNorm, bn_momentum_schedule
from backtoreality_tpu.nn.mlp import SharedMLP, PointwiseMLP
from backtoreality_tpu.nn.sa_fp import (
    SAModuleVotes,
    SAModuleCenters,
    SAModuleOffset,
    SAModuleVotesRlt,
    SAModuleMSG,
    LFPModuleMSG,
    FPModule,
    group_all,
)

__all__ = [
    "BatchNorm",
    "bn_momentum_schedule",
    "SharedMLP",
    "PointwiseMLP",
    "SAModuleVotes",
    "SAModuleCenters",
    "SAModuleOffset",
    "SAModuleVotesRlt",
    "SAModuleMSG",
    "LFPModuleMSG",
    "FPModule",
]
