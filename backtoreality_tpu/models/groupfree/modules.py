"""GroupFree3D building blocks
(`detection/GroupFree3D/models/modules.py:16-193`).
"""

import jax.numpy as jnp
from flax import linen as nn
from backtoreality_tpu.nn.mlp import (
    torch_default_bias_init,
    torch_default_kernel_init,
)

from backtoreality_tpu import ops
from backtoreality_tpu.nn import BatchNorm


class PointsObjClsModule(nn.Module):
    """Per-seed objectness scorer for KPS (`modules.py:16-44`).
    (B, num_seed, C) -> (B, num_seed, 1) logits."""

    feature_dim: int = 288
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seed_features, *, train: bool, bn_momentum=0.1):
        net = seed_features
        for i in range(2):
            net = nn.Dense(self.feature_dim, use_bias=False,
                           kernel_init=torch_default_kernel_init,
                           dtype=self.dtype, name=f"dense{i}")(net)
            net = BatchNorm(self.feature_dim, dtype=self.dtype,
                            name=f"bn{i}")(net, train=train,
                                           momentum=bn_momentum)
            net = nn.relu(net)
        return nn.Dense(1, use_bias=True, dtype=self.dtype,
                        kernel_init=torch_default_kernel_init,
                        bias_init=torch_default_bias_init(net.shape[-1]),
                        name="out")(net)


class PositionEmbeddingLearned(nn.Module):
    """Learned absolute position embedding (`modules.py:47-63`):
    Conv(3or6 -> D) + BN + ReLU + Conv(D -> D) over positions."""

    num_pos_feats: int = 288
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, *, train: bool, bn_momentum=0.1):
        net = nn.Dense(self.num_pos_feats, use_bias=False,
                       kernel_init=torch_default_kernel_init,
                       dtype=self.dtype, name="dense0")(xyz)
        net = BatchNorm(self.num_pos_feats, dtype=self.dtype,
                        name="bn0")(net, train=train,
                                    momentum=bn_momentum)
        net = nn.relu(net)
        return nn.Dense(self.num_pos_feats, use_bias=True,
                        kernel_init=torch_default_kernel_init,
                        bias_init=torch_default_bias_init(net.shape[-1]),
                        dtype=self.dtype, name="dense1")(net)


def fps_sample(xyz, features, num_proposal):
    """`FPSModule` (`modules.py:66-84`)."""
    inds = ops.furthest_point_sample(xyz, num_proposal)
    return (ops.gather_points(xyz, inds),
            ops.gather_points(features, inds), inds)


def general_sample(xyz, features, sample_inds):
    """`GeneralSamplingModule` (`modules.py:87-100`)."""
    return (ops.gather_points(xyz, sample_inds),
            ops.gather_points(features, sample_inds), sample_inds)


class PredictHead(nn.Module):
    """Per-layer box head (`modules.py:103-193`): shared 2x Dense+BN+ReLU
    then 7 separate linear heads. Objectness is a single sigmoid logit.
    Writes `{prefix}*` keys into end_points and returns
    (center, pred_size) for the next layer's position embedding."""

    num_class: int
    num_heading_bin: int
    num_size_cluster: int
    mean_size_arr: tuple
    seed_feat_dim: int = 288
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, base_xyz, end_points, prefix="", *,
                 train: bool, bn_momentum=0.1):
        """features (B, K, C); base_xyz (B, K, 3)."""
        nh, ns = self.num_heading_bin, self.num_size_cluster
        net = features
        for i in range(2):
            net = nn.Dense(self.seed_feat_dim, use_bias=False,
                           kernel_init=torch_default_kernel_init,
                           dtype=self.dtype, name=f"dense{i}")(net)
            net = BatchNorm(self.seed_feat_dim, dtype=self.dtype,
                            name=f"bn{i}")(net, train=train,
                                           momentum=bn_momentum)
            net = nn.relu(net)
        net = net.astype(jnp.float32)

        def head(out, name):
            return nn.Dense(out, use_bias=True, dtype=jnp.float32,
                            kernel_init=torch_default_kernel_init,
                            bias_init=torch_default_bias_init(
                                net.shape[-1]),
                            name=name)(net)

        objectness_scores = head(1, "objectness")  # (B, K, 1)
        center = base_xyz + head(3, "center_residual")
        heading_scores = head(nh, "heading_class")
        heading_residuals_normalized = head(nh, "heading_residual")
        heading_residuals = heading_residuals_normalized * (jnp.pi / nh)

        msa = jnp.asarray(self.mean_size_arr, jnp.float32)[None, None]
        size_scores = head(ns, "size_class")
        b, k = features.shape[0], features.shape[1]
        size_residuals_normalized = head(ns * 3, "size_residual").reshape(
            b, k, ns, 3)
        size_residuals = size_residuals_normalized * msa
        size_recover = size_residuals + msa
        pred_size_class = jnp.argmax(size_scores, -1)
        pred_size = jnp.take_along_axis(
            size_recover, pred_size_class[..., None, None], axis=2
        )[:, :, 0, :]
        sem_cls_scores = head(self.num_class, "sem_cls")

        end_points[f"{prefix}base_xyz"] = base_xyz
        end_points[f"{prefix}objectness_scores"] = objectness_scores
        end_points[f"{prefix}center"] = center
        end_points[f"{prefix}heading_scores"] = heading_scores
        end_points[f"{prefix}heading_residuals_normalized"] = (
            heading_residuals_normalized)
        end_points[f"{prefix}heading_residuals"] = heading_residuals
        end_points[f"{prefix}size_scores"] = size_scores
        end_points[f"{prefix}size_residuals_normalized"] = (
            size_residuals_normalized)
        end_points[f"{prefix}size_residuals"] = size_residuals
        end_points[f"{prefix}pred_size"] = pred_size
        end_points[f"{prefix}sem_cls_scores"] = sem_cls_scores
        return center, pred_size
