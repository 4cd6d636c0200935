"""GroupFree3D detector (`detection/GroupFree3D/models/detector.py:15-232`).

backbone -> KPS top-k query selection (or FPS) -> proposal head ->
num_decoder_layers x (decoder layer + per-layer PredictHead), with
base_xyz/base_size stop-gradiented between layers and per-layer learned
position embeddings added to Q/K/V.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn
from backtoreality_tpu.nn.mlp import (
    torch_default_bias_init,
    torch_default_kernel_init,
)

from backtoreality_tpu.models.groupfree.backbone import GFBackbone
from backtoreality_tpu.models.groupfree.modules import (
    PointsObjClsModule,
    PositionEmbeddingLearned,
    PredictHead,
    fps_sample,
    general_sample,
)
from backtoreality_tpu.models.groupfree.transformer import (
    TransformerDecoderLayer,
)


class GroupFreeDetector(nn.Module):
    num_class: int
    num_heading_bin: int
    num_size_cluster: int
    mean_size_arr: tuple
    input_feature_dim: int = 0
    width: int = 1
    num_proposal: int = 256
    sampling: str = "kps"
    dropout_rate: float = 0.1
    nhead: int = 8
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    self_position_embedding: str = "xyz_learned"
    cross_position_embedding: str = "xyz_learned"
    query_mode: str = "stratified"
    fps_candidates: int | None = None
    dtype: jnp.dtype = jnp.float32
    # box-regression heads stay f32 under bf16 training (residual
    # precision; see votenet.VoteNet.head_dtype) — they run on 256
    # queries, a negligible share of the step FLOPs
    head_dtype: jnp.dtype = jnp.float32
    f32_tail: int = 0  # see GFBackbone.f32_tail

    def setup(self):
        self.backbone_net = GFBackbone(
            input_feature_dim=self.input_feature_dim, width=self.width,
            query_mode=self.query_mode,
            fps_candidates=self.fps_candidates, dtype=self.dtype,
            f32_tail=self.f32_tail)
        if self.sampling == "kps":
            self.points_obj_cls = PointsObjClsModule(288,
                                                     dtype=self.dtype)
        head_kw = dict(
            num_class=self.num_class,
            num_heading_bin=self.num_heading_bin,
            num_size_cluster=self.num_size_cluster,
            mean_size_arr=self.mean_size_arr,
            seed_feat_dim=288, dtype=self.head_dtype)
        self.proposal_head = PredictHead(**head_kw)
        if self.num_decoder_layers > 0:
            self.decoder_key_proj = nn.Dense(
                288, dtype=self.dtype,
                kernel_init=torch_default_kernel_init,
                bias_init=torch_default_bias_init(288))
            self.decoder_query_proj = nn.Dense(
                288, dtype=self.dtype,
                kernel_init=torch_default_kernel_init,
                bias_init=torch_default_bias_init(288))
            if self.self_position_embedding != "none":
                self.decoder_self_posembeds = [
                    PositionEmbeddingLearned(288, dtype=self.dtype)
                    for _ in range(self.num_decoder_layers)]
            if self.cross_position_embedding != "none":
                self.decoder_cross_posembeds = [
                    PositionEmbeddingLearned(288, dtype=self.dtype)
                    for _ in range(self.num_decoder_layers)]
            self.decoder = [
                TransformerDecoderLayer(
                    288, self.nhead, self.dim_feedforward,
                    self.dropout_rate, dtype=self.dtype)
                for _ in range(self.num_decoder_layers)]
            self.prediction_heads = [
                PredictHead(**head_kw)
                for _ in range(self.num_decoder_layers)]

    def _select_queries(self, end_points, *, train, bn_momentum):
        xyz = end_points["fp2_xyz"]
        features = end_points["fp2_features"]
        if self.sampling == "fps":
            q_xyz, q_feat, inds = fps_sample(xyz, features,
                                             self.num_proposal)
        elif self.sampling == "kps":
            logits = self.points_obj_cls(
                features, train=train, bn_momentum=bn_momentum)
            end_points["seeds_obj_cls_logits"] = logits  # (B, S, 1)
            scores = jax.nn.sigmoid(logits[..., 0])
            _, inds = jax.lax.top_k(scores, self.num_proposal)
            inds = inds.astype(jnp.int32)
            q_xyz, q_feat, inds = general_sample(xyz, features, inds)
        else:
            raise NotImplementedError(self.sampling)
        end_points["query_points_xyz"] = q_xyz
        end_points["query_points_feature"] = q_feat
        end_points["query_points_sample_inds"] = inds
        return q_xyz, q_feat

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

        if self.num_decoder_layers <= 0:
            return end_points

        query = self.decoder_query_proj(cluster_feature)
        key = self.decoder_key_proj(end_points["fp2_features"])
        key_pos = end_points["fp2_xyz"]

        for i in range(self.num_decoder_layers):
            prefix = ("last_" if i == self.num_decoder_layers - 1
                      else f"{i}head_")
            if self.self_position_embedding == "none":
                query_pos_embed = None
            elif self.self_position_embedding == "xyz_learned":
                query_pos_embed = self.decoder_self_posembeds[i](
                    base_xyz, train=train, bn_momentum=bn_momentum)
            elif self.self_position_embedding == "loc_learned":
                query_pos_embed = self.decoder_self_posembeds[i](
                    jnp.concatenate([base_xyz, base_size], -1),
                    train=train, bn_momentum=bn_momentum)
            else:
                raise NotImplementedError(self.self_position_embedding)
            if self.cross_position_embedding == "none":
                key_pos_embed = None
            else:
                key_pos_embed = self.decoder_cross_posembeds[i](
                    key_pos, train=train, bn_momentum=bn_momentum)

            query = self.decoder[i](
                query, key, query_pos_embed, key_pos_embed, train=train)
            base_xyz, base_size = self.prediction_heads[i](
                query, cluster_xyz, end_points, prefix, train=train,
                bn_momentum=bn_momentum)
            base_xyz = jax.lax.stop_gradient(base_xyz)
            base_size = jax.lax.stop_gradient(base_size)

        return end_points
