"""VoteNet detector (`detection/Votenet/models/votenet.py:25-100`).

backbone -> hough voting (+ L2-normalized vote features,
`votenet.py:93-94`) -> proposal module. Also serves as the weak-label
variant (`votenet_weak.py` is graph-identical; only the criterion
differs).
"""

import jax.numpy as jnp
from flax import linen as nn

from backtoreality_tpu.models.votenet.backbone import Pointnet2Backbone
from backtoreality_tpu.models.votenet.voting import VotingModule
from backtoreality_tpu.models.votenet.proposal import ProposalModule


class VoteNet(nn.Module):
    num_class: int
    num_heading_bin: int
    num_size_cluster: int
    mean_size_arr: tuple  # (NS, 3) nested tuples (static/hashable)
    input_feature_dim: int = 0
    num_proposal: int = 256
    vote_factor: int = 1
    sampling: str = "vote_fps"
    query_mode: str = "stratified"
    fps_candidates: int | None = None
    dtype: jnp.dtype = jnp.float32
    # regression-head compute dtype. bf16 training with bf16 heads
    # loses measurable end-quality (size/center residual precision
    # drives both localization and, on md40, classification); keeping
    # the voting + proposal MLPs in f32 costs <2% of the step FLOPs
    # (they run on 1024/256 points vs the backbone's 40k).
    head_dtype: jnp.dtype = jnp.float32
    # selective precision: trailing backbone stages forced to f32 under
    # bf16 compute (see Pointnet2Backbone.f32_tail)
    f32_tail: int = 0

    def setup(self):
        self.backbone_net = Pointnet2Backbone(
            input_feature_dim=self.input_feature_dim,
            query_mode=self.query_mode,
            fps_candidates=self.fps_candidates, dtype=self.dtype,
            f32_tail=self.f32_tail)
        self.vgen = VotingModule(self.vote_factor, 256,
                                 dtype=self.head_dtype)
        self.pnet = ProposalModule(
            num_class=self.num_class,
            num_heading_bin=self.num_heading_bin,
            num_size_cluster=self.num_size_cluster,
            mean_size_arr=self.mean_size_arr,
            num_proposal=self.num_proposal,
            sampling=self.sampling,
            query_mode=self.query_mode,
            dtype=self.head_dtype)

    def __call__(self, point_clouds, rng=None, *, train: bool,
                 bn_momentum=0.1):
        """point_clouds (B, N, 3+C). Returns the end_points dict."""
        end_points = self.backbone_net(
            point_clouds, train=train, bn_momentum=bn_momentum)

        xyz = end_points["fp2_xyz"]
        features = end_points["fp2_features"]
        end_points["seed_inds"] = end_points["fp2_inds"]
        end_points["seed_xyz"] = xyz
        end_points["seed_features"] = features

        xyz, features = self.vgen(
            xyz, features, train=train, bn_momentum=bn_momentum)
        norm = jnp.linalg.norm(features, axis=-1, keepdims=True)
        features = features / jnp.maximum(norm, 1e-12)
        end_points["vote_xyz"] = xyz
        end_points["vote_features"] = features

        end_points = self.pnet(
            xyz, features, end_points, rng, train=train,
            bn_momentum=bn_momentum)
        return end_points
