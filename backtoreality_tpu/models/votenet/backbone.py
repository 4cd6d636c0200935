"""PointNet++ backbone for VoteNet.

Re-design of `detection/Votenet/models/backbone_module.py:21-262`:
4 single-scale SA layers (2048/0.2/64 -> 1024/0.4/32 -> 512/0.8/16 ->
256/1.2/16) + 2 FP layers back to 1024 seeds @ 256 channels. The jitter
variant adds a center-grouping head (`ctjt`) producing per-GT-center
features concatenated with the class one-hot
(`backbone_module.py:136-262`).

MLP widths here exclude the input width (inferred); the reference lists
it explicitly and adds +3 for use_xyz.
"""

import jax.numpy as jnp
from flax import linen as nn

from backtoreality_tpu.nn import SAModuleVotes, SAModuleCenters, FPModule


class Pointnet2Backbone(nn.Module):
    input_feature_dim: int = 0
    query_mode: str = "stratified"
    fps_candidates: int | None = None  # subset-FPS at SA1 (speed knob)
    dtype: jnp.dtype = jnp.float32
    # selective precision: run the LAST `f32_tail` stages (counting
    # back from fp2: fp2, fp1, sa4, ...) in f32 regardless of `dtype`.
    # The HBM traffic that makes bf16 worth having lives in sa1/sa2
    # (20-40k points); the tail stages run on <=512 points, so an f32
    # tail keeps ~all of bf16's bandwidth win while feeding the
    # classification heads full-precision seed features.
    f32_tail: int = 0

    def _stage_dtype(self, idx):
        """idx: 0..5 over (sa1..sa4, fp1, fp2)."""
        return jnp.float32 if (6 - idx) <= self.f32_tail else self.dtype

    def setup(self):
        kw = dict(use_xyz=True, normalize_xyz=True,
                  query_mode=self.query_mode)
        self.sa1 = SAModuleVotes(
            npoint=2048, radius=0.2, nsample=64, mlp=[64, 64, 128],
            fps_candidates=self.fps_candidates,
            dtype=self._stage_dtype(0), **kw)
        self.sa2 = SAModuleVotes(
            npoint=1024, radius=0.4, nsample=32, mlp=[128, 128, 256],
            dtype=self._stage_dtype(1), **kw)
        self.sa3 = SAModuleVotes(
            npoint=512, radius=0.8, nsample=16, mlp=[128, 128, 256],
            dtype=self._stage_dtype(2), **kw)
        self.sa4 = SAModuleVotes(
            npoint=256, radius=1.2, nsample=16, mlp=[128, 128, 256],
            dtype=self._stage_dtype(3), **kw)
        self.fp1 = FPModule(mlp=[256, 256], dtype=self._stage_dtype(4))
        self.fp2 = FPModule(mlp=[256, 256], dtype=self._stage_dtype(5))

    def __call__(self, pointcloud, end_points=None, *, train: bool,
                 bn_momentum=0.1):
        """pointcloud: (B, N, 3 + input_feature_dim). Returns end_points
        with sa*/fp2 xyz/features/inds (features channels-last)."""
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

        xyz, features, inds = self.sa3(
            xyz, features, train=train, bn_momentum=bn_momentum)
        end_points["sa3_xyz"] = xyz
        end_points["sa3_features"] = features

        xyz, features, inds = self.sa4(
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
        end_points["fp2_features"] = features
        end_points["fp2_xyz"] = end_points["sa2_xyz"]
        num_seed = end_points["fp2_xyz"].shape[1]
        # seed indices into the original cloud (`backbone_module.py:132`)
        end_points["fp2_inds"] = end_points["sa1_inds"][:, 0:num_seed]
        return end_points


class Pointnet2BackboneCam(nn.Module):
    """SA-only backbone variant (`Pointnet2Backbone_cam`,
    `backbone_module.py:265-367`; unused by the four train paths — the
    class-activation-map experiment it fed was removed from the
    reference, leaving only this backbone and `get_loss_cam`): the same
    4 SA layers but sa4 keeps 256 points and there are NO FP layers;
    end_points carries sa1..sa4 xyz/features (sa1 also inds)."""

    input_feature_dim: int = 0
    query_mode: str = "stratified"
    fps_candidates: int | None = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(use_xyz=True, normalize_xyz=True,
                  query_mode=self.query_mode, dtype=self.dtype)
        self.sa1 = SAModuleVotes(
            npoint=2048, radius=0.2, nsample=64, mlp=[64, 64, 128],
            fps_candidates=self.fps_candidates, **kw)
        self.sa2 = SAModuleVotes(
            npoint=1024, radius=0.4, nsample=32, mlp=[128, 128, 256], **kw)
        self.sa3 = SAModuleVotes(
            npoint=512, radius=0.8, nsample=16, mlp=[128, 128, 256], **kw)
        self.sa4 = SAModuleVotes(
            npoint=256, radius=1.2, nsample=16, mlp=[128, 128, 256], **kw)

    def __call__(self, pointcloud, end_points=None, *, train: bool,
                 bn_momentum=0.1):
        if end_points is None:
            end_points = {}
        xyz = pointcloud[..., 0:3]
        features = (
            pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None
        )
        for i, sa in enumerate((self.sa1, self.sa2, self.sa3, self.sa4),
                               start=1):
            xyz, features, inds = sa(
                xyz, features, train=train, bn_momentum=bn_momentum)
            if i <= 2:
                end_points[f"sa{i}_inds"] = inds
            end_points[f"sa{i}_xyz"] = xyz
            end_points[f"sa{i}_features"] = features
        return end_points


class Pointnet2BackboneJitter(nn.Module):
    """Backbone + center-jitter head (`Pointnet2Backbone_jitter`,
    `backbone_module.py:136-262`): groups sa2 features around given GT
    centers and appends the class one-hot, producing `center_features`
    for the jitter-prediction net."""

    num_class: int = 22
    input_feature_dim: int = 0
    query_mode: str = "stratified"
    fps_candidates: int | None = None
    dtype: jnp.dtype = jnp.float32
    f32_tail: int = 0

    def setup(self):
        self.backbone = Pointnet2Backbone(
            input_feature_dim=self.input_feature_dim,
            query_mode=self.query_mode,
            fps_candidates=self.fps_candidates, dtype=self.dtype,
            f32_tail=self.f32_tail)
        # 64 centers max, r=0.8, ONE mlp layer 256(+3 xyz) -> 128, and
        # normalize_xyz=False (`backbone_module.py:187-195`; the
        # reference's mlp=[256, 128] lists the input width explicitly —
        # round-3 carried an extra 256-wide hidden layer and
        # radius-normalized grouped xyz here, a real center_features
        # contract divergence caught by the round-4 DA_jitter
        # weight-import golden test)
        self.ctjt = SAModuleCenters(
            radius=0.8, nsample=16, mlp=[128], use_xyz=True,
            normalize_xyz=False, query_mode=self.query_mode,
            dtype=self.dtype)

    def __call__(self, pointcloud, center_label, sem_cls_label,
                 end_points=None, *, train: bool, bn_momentum=0.1):
        """center_label (B, K, 3) GT centers; sem_cls_label (B, K) int.

        Adds `center_features` (B, K, 128 + num_class) to end_points
        (`backbone_module.py:257-260`)."""
        end_points = self.backbone(
            pointcloud, end_points, train=train, bn_momentum=bn_momentum)
        # groups the FP2-refined seed features (at sa2 positions), not
        # the raw sa2 features (`backbone_module.py:257-259`)
        feats = self.ctjt(
            end_points["sa2_xyz"], end_points["fp2_features"],
            center_label, train=train, bn_momentum=bn_momentum)
        onehot = jnp.eye(self.num_class, dtype=feats.dtype)[
            sem_cls_label.astype(jnp.int32)]
        end_points["center_features"] = jnp.concatenate(
            [feats, onehot], axis=-1)
        return end_points
