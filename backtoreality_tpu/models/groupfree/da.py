"""GroupFree3D domain-adaptation variants
(`detection/GroupFree3D/models/detector_DA.py:56-585`).

DA adds, behind gradient reversal: a global discriminator over seed
features (288->256->128 + Linear 2, mean-pooled) and a local
discriminator on the LAST decoder layer's query (288->128->128->1 +
sigmoid). The jitter variant additionally groups fp2 features at given
GT centers (SA-centers head, r=0.8, mlp [288->128]) + class one-hot,
and predicts per-center jitter with Conv 150->64->3.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn
from backtoreality_tpu.nn.mlp import (
    torch_default_bias_init,
    torch_default_kernel_init,
)

from backtoreality_tpu.models.groupfree.detector import GroupFreeDetector
from backtoreality_tpu.models.votenet.da import _ConvBNStack, grad_reverse
from backtoreality_tpu.nn import SAModuleCenters
from backtoreality_tpu.nn.norm import BatchNorm


class CALayer(nn.Module):
    """Channel-attention (SE) block, dead in the reference: defined at
    `detection/GroupFree3D/models/detector_DA.py:35-53` but never
    instantiated. Channels-last rebuild: the 1x1 squeeze/excite Conv2d
    pair becomes Dense over the channel axis; `y = x*sig(...) + x`,
    then the reference flattens and batch-norms the (N*C,) feature
    vector (`nn.BatchNorm1d(288*64)` — it was written for
    (B, 288, 64)-shaped inputs).
    """

    channel: int
    reduction: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, bn_momentum=0.1):
        squeezed = self.channel // self.reduction
        y = nn.Dense(squeezed, dtype=self.dtype,
                     kernel_init=torch_default_kernel_init,
                     bias_init=torch_default_bias_init(self.channel))(x)
        y = nn.relu(y)
        y = nn.Dense(self.channel, dtype=self.dtype,
                     kernel_init=torch_default_kernel_init,
                     bias_init=torch_default_bias_init(squeezed))(y)
        y = x * jax.nn.sigmoid(y) + x
        y = y.reshape(y.shape[0], -1)
        y = BatchNorm(y.shape[-1], dtype=self.dtype)(
            y, train=train, momentum=bn_momentum)
        return y


class _GFDAHeads(nn.Module):
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.global_netD1 = _ConvBNStack((256, 128), dtype=self.dtype)
        self.global_netD2 = nn.Dense(
            2, dtype=self.dtype,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(128))
        self.decoder_netD = _ConvBNStack((128, 128), out=1,
                                         dtype=self.dtype)

    def global_pred(self, seed_features, *, train, bn_momentum):
        g = self.global_netD1(grad_reverse(seed_features), train=train,
                              bn_momentum=bn_momentum)
        return self.global_netD2(jnp.mean(g, axis=1))  # (B, 2)

    def local_pred(self, query, *, train, bn_momentum):
        l = self.decoder_netD(grad_reverse(query), train=train,
                              bn_momentum=bn_momentum)
        return jax.nn.sigmoid(l)  # (B, K, 1)


class GroupFreeDetectorDA(GroupFreeDetector):
    """DA detector: same graph + discriminators."""

    def setup(self):
        super().setup()
        self.da_heads = _GFDAHeads(dtype=self.dtype)

    def __call__(self, point_clouds, *, train: bool, bn_momentum=0.1):
        end_points = self.backbone_net(
            point_clouds, train=train, bn_momentum=bn_momentum)
        end_points["seed_inds"] = end_points["fp2_inds"]
        end_points["seed_xyz"] = end_points["fp2_xyz"]
        end_points["seed_features"] = end_points["fp2_features"]

        cluster_xyz, cluster_feature = self._select_queries(
            end_points, train=train, bn_momentum=bn_momentum)
        proposal_center, proposal_size = self.proposal_head(
            cluster_feature, cluster_xyz, end_points, "proposal_",
            train=train, bn_momentum=bn_momentum)
        base_xyz = jax.lax.stop_gradient(proposal_center)
        base_size = jax.lax.stop_gradient(proposal_size)

        query = self.decoder_query_proj(cluster_feature)
        key = self.decoder_key_proj(end_points["fp2_features"])
        key_pos = end_points["fp2_xyz"]

        for i in range(self.num_decoder_layers):
            prefix = ("last_" if i == self.num_decoder_layers - 1
                      else f"{i}head_")
            if self.self_position_embedding == "loc_learned":
                qp_in = jnp.concatenate([base_xyz, base_size], -1)
            else:
                qp_in = base_xyz
            query_pos_embed = self.decoder_self_posembeds[i](
                qp_in, train=train, bn_momentum=bn_momentum)
            key_pos_embed = self.decoder_cross_posembeds[i](
                key_pos, train=train, bn_momentum=bn_momentum)
            query = self.decoder[i](
                query, key, query_pos_embed, key_pos_embed, train=train)
            if prefix == "last_":
                end_points["last_local_d_pred"] = self.da_heads.local_pred(
                    query, train=train, bn_momentum=bn_momentum)
            base_xyz, base_size = self.prediction_heads[i](
                query, cluster_xyz, end_points, prefix, train=train,
                bn_momentum=bn_momentum)
            base_xyz = jax.lax.stop_gradient(base_xyz)
            base_size = jax.lax.stop_gradient(base_size)

        end_points["global_d_pred"] = self.da_heads.global_pred(
            end_points["seed_features"], train=train,
            bn_momentum=bn_momentum)
        return end_points


class GroupFreeDetectorDAJitter(GroupFreeDetector):
    """DA + center-jitter prediction
    (`detector_DA.py:317-585`, backbone `backbone_module.py:140-270`)."""

    def setup(self):
        super().setup()
        self.da_heads = _GFDAHeads(dtype=self.dtype)
        self.ctjt_head = SAModuleCenters(
            radius=0.8, nsample=16, mlp=[128], use_xyz=True,
            normalize_xyz=True, query_mode=self.query_mode,
            dtype=self.dtype)
        self.jitter_net = _ConvBNStack((64,), out=3, dtype=self.dtype)

    def __call__(self, point_clouds, center_label, sem_cls_label, *,
                 train: bool, bn_momentum=0.1):
        end_points = self.backbone_net(
            point_clouds, train=train, bn_momentum=bn_momentum)
        end_points["seed_inds"] = end_points["fp2_inds"]
        end_points["seed_xyz"] = end_points["fp2_xyz"]
        end_points["seed_features"] = end_points["fp2_features"]

        # center-jitter head on fp2 features grouped at GT centers
        cf = self.ctjt_head(
            end_points["sa2_xyz"], end_points["fp2_features"],
            center_label, train=train, bn_momentum=bn_momentum)
        onehot = jnp.eye(self.num_class, dtype=cf.dtype)[
            sem_cls_label.astype(jnp.int32)]
        end_points["center_features"] = jnp.concatenate(
            [cf, onehot], axis=-1)
        end_points["jitter_pred"] = self.jitter_net(
            end_points["center_features"], train=train,
            bn_momentum=bn_momentum)

        cluster_xyz, cluster_feature = self._select_queries(
            end_points, train=train, bn_momentum=bn_momentum)
        proposal_center, proposal_size = self.proposal_head(
            cluster_feature, cluster_xyz, end_points, "proposal_",
            train=train, bn_momentum=bn_momentum)
        base_xyz = jax.lax.stop_gradient(proposal_center)
        base_size = jax.lax.stop_gradient(proposal_size)

        query = self.decoder_query_proj(cluster_feature)
        key = self.decoder_key_proj(end_points["fp2_features"])
        key_pos = end_points["fp2_xyz"]

        for i in range(self.num_decoder_layers):
            prefix = ("last_" if i == self.num_decoder_layers - 1
                      else f"{i}head_")
            if self.self_position_embedding == "loc_learned":
                qp_in = jnp.concatenate([base_xyz, base_size], -1)
            else:
                qp_in = base_xyz
            query_pos_embed = self.decoder_self_posembeds[i](
                qp_in, train=train, bn_momentum=bn_momentum)
            key_pos_embed = self.decoder_cross_posembeds[i](
                key_pos, train=train, bn_momentum=bn_momentum)
            query = self.decoder[i](
                query, key, query_pos_embed, key_pos_embed, train=train)
            if prefix == "last_":
                end_points["last_local_d_pred"] = self.da_heads.local_pred(
                    query, train=train, bn_momentum=bn_momentum)
            base_xyz, base_size = self.prediction_heads[i](
                query, cluster_xyz, end_points, prefix, train=train,
                bn_momentum=bn_momentum)
            base_xyz = jax.lax.stop_gradient(base_xyz)
            base_size = jax.lax.stop_gradient(base_size)

        end_points["global_d_pred"] = self.da_heads.global_pred(
            end_points["seed_features"], train=train,
            bn_momentum=bn_momentum)
        return end_points
