"""Point-cloud op library.

Every op the reference implements as a CUDA kernel
(`detection/Votenet/pointnet2/_ext_src/src/*.cu`) exists here as a
pure-JAX (XLA) implementation; the hot ops additionally have Pallas TPU
kernels selected automatically on TPU backends.

All ops are batched, fixed-shape, channels-last, and differentiable where
the reference op is (gather/group/interpolate; sampling and neighbor
search are integer-valued and non-differentiable).
"""

from backtoreality_tpu.ops.fps import furthest_point_sample
from backtoreality_tpu.ops.ball_query import ball_query, ball_query_stratified
from backtoreality_tpu.ops.grouping import (gather_points, group_points,
                                             group_points_stratified,
                                             sample_uniformly)
from backtoreality_tpu.ops.interpolate import three_nn, three_interpolate
from backtoreality_tpu.ops.chamfer import nn_distance, huber_loss

__all__ = [
    "furthest_point_sample",
    "ball_query",
    "ball_query_stratified",
    "gather_points",
    "group_points",
    "group_points_stratified",
    "sample_uniformly",
    "three_nn",
    "three_interpolate",
    "nn_distance",
    "huber_loss",
]
