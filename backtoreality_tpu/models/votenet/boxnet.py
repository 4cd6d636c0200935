"""BoxNet — the VoteNet-without-voting ablation
(`detection/Votenet/models/boxnet.py:20-115`): backbone seeds feed the
proposal module directly (no Hough voting stage). Paired with
`losses.votenet.get_loss_boxnet`.
"""

import jax.numpy as jnp
from flax import linen as nn

from backtoreality_tpu.models.votenet.backbone import Pointnet2Backbone
from backtoreality_tpu.models.votenet.proposal import ProposalModule


class BoxNet(nn.Module):
    num_class: int
    num_heading_bin: int
    num_size_cluster: int
    mean_size_arr: tuple
    input_feature_dim: int = 0
    num_proposal: int = 256
    sampling: str = "vote_fps"
    query_mode: str = "stratified"
    fps_candidates: int | None = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone_net = Pointnet2Backbone(
            input_feature_dim=self.input_feature_dim,
            query_mode=self.query_mode,
            fps_candidates=self.fps_candidates, dtype=self.dtype)
        self.pnet = ProposalModule(
            num_class=self.num_class,
            num_heading_bin=self.num_heading_bin,
            num_size_cluster=self.num_size_cluster,
            mean_size_arr=self.mean_size_arr,
            num_proposal=self.num_proposal,
            sampling=self.sampling,
            query_mode=self.query_mode,
            dtype=self.dtype)

    def __call__(self, point_clouds, rng=None, *, train: bool,
                 bn_momentum=0.1):
        end_points = self.backbone_net(
            point_clouds, train=train, bn_momentum=bn_momentum)
        xyz = end_points["fp2_xyz"]
        features = end_points["fp2_features"]
        end_points["seed_inds"] = end_points["fp2_inds"]
        end_points["seed_xyz"] = xyz
        end_points["seed_features"] = features
        # directly predict boxes from seeds (skips voting)
        return self.pnet(xyz, features, end_points, rng, train=train,
                         bn_momentum=bn_momentum)
