"""GroupFree3D PointNet++ backbone
(`detection/GroupFree3D/models/backbone_module.py:21-138`).

Same 4xSA + 2xFP topology as VoteNet's, with width/depth multipliers
and fp2 emitting 288 channels (the transformer model dim).
"""

import jax.numpy as jnp
from flax import linen as nn

from backtoreality_tpu.nn import SAModuleVotes, FPModule


class GFBackbone(nn.Module):
    input_feature_dim: int = 0
    width: int = 1
    depth: int = 2
    query_mode: str = "stratified"
    fps_candidates: int | None = None  # subset-FPS at SA1 (speed knob)
    dtype: jnp.dtype = jnp.float32
    # run the LAST N stages (fp2, fp1, sa4, ...) in f32 under bf16
    # compute — see votenet.backbone.Pointnet2Backbone.f32_tail
    f32_tail: int = 0

    def _stage_dtype(self, idx):
        """idx: 0..5 over (sa1..sa4, fp1, fp2)."""
        return jnp.float32 if (6 - idx) <= self.f32_tail else self.dtype

    def setup(self):
        w, d = self.width, self.depth
        kw = dict(use_xyz=True, normalize_xyz=True,
                  query_mode=self.query_mode)
        self.sa1 = SAModuleVotes(
            npoint=2048, radius=0.2, nsample=64,
            mlp=[64 * w] * d + [128 * w],
            fps_candidates=self.fps_candidates,
            dtype=self._stage_dtype(0), **kw)
        self.sa2 = SAModuleVotes(
            npoint=1024, radius=0.4, nsample=32,
            mlp=[128 * w] * d + [256 * w],
            dtype=self._stage_dtype(1), **kw)
        self.sa3 = SAModuleVotes(
            npoint=512, radius=0.8, nsample=16,
            mlp=[128 * w] * d + [256 * w],
            dtype=self._stage_dtype(2), **kw)
        self.sa4 = SAModuleVotes(
            npoint=256, radius=1.2, nsample=16,
            mlp=[128 * w] * d + [256 * w],
            dtype=self._stage_dtype(3), **kw)
        self.fp1 = FPModule(mlp=[256 * w, 256 * w],
                            dtype=self._stage_dtype(4))
        self.fp2 = FPModule(mlp=[256 * w, 288],
                            dtype=self._stage_dtype(5))

    def __call__(self, pointcloud, end_points=None, *, train: bool,
                 bn_momentum=0.1):
        if end_points is None:
            end_points = {}
        xyz = pointcloud[..., 0:3]
        features = (
            pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None
        )

        xyz, features, inds = self.sa1(
            xyz, features, train=train, bn_momentum=bn_momentum)
        end_points["sa1_inds"] = inds
        end_points["sa1_xyz"] = xyz
        end_points["sa1_features"] = features

        xyz, features, inds = self.sa2(
            xyz, features, train=train, bn_momentum=bn_momentum)
        end_points["sa2_inds"] = inds
        end_points["sa2_xyz"] = xyz
        end_points["sa2_features"] = features

        xyz, features, _ = self.sa3(
            xyz, features, train=train, bn_momentum=bn_momentum)
        end_points["sa3_xyz"] = xyz
        end_points["sa3_features"] = features

        xyz, features, _ = self.sa4(
            xyz, features, train=train, bn_momentum=bn_momentum)
        end_points["sa4_xyz"] = xyz
        end_points["sa4_features"] = features

        features = self.fp1(
            end_points["sa3_xyz"], end_points["sa4_xyz"],
            end_points["sa3_features"], end_points["sa4_features"],
            train=train, bn_momentum=bn_momentum)
        features = self.fp2(
            end_points["sa2_xyz"], end_points["sa3_xyz"],
            end_points["sa2_features"], features,
            train=train, bn_momentum=bn_momentum)
        end_points["fp2_features"] = features  # (B, 1024, 288)
        end_points["fp2_xyz"] = end_points["sa2_xyz"]
        num_seed = end_points["fp2_xyz"].shape[1]
        end_points["fp2_inds"] = end_points["sa1_inds"][:, 0:num_seed]
        return end_points
