"""Domain-adaptation VoteNet variants
(`detection/Votenet/models/votenet_DA.py:47-332`).

Adds, behind gradient reversal:
* a global domain classifier over mean-pooled seed features
  (Conv 256->256->128 + Linear 128->2);
* a local per-proposal discriminator over aggregated vote features
  (Conv 128->128->128->1 + sigmoid);
* (jitter variant) a jitter-prediction net Conv 150->64->3 on
  `center_features` plus a jitter-domain discriminator
  (Conv 150->128->128->1 + sigmoid).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn
from backtoreality_tpu.nn.mlp import (
    torch_default_bias_init,
    torch_default_kernel_init,
)

from backtoreality_tpu.models.votenet.backbone import (
    Pointnet2Backbone,
    Pointnet2BackboneJitter,
)
from backtoreality_tpu.models.votenet.voting import VotingModule
from backtoreality_tpu.models.votenet.proposal import ProposalModule
from backtoreality_tpu.nn import BatchNorm


@jax.custom_vjp
def grad_reverse(x):
    """Identity forward, negated gradient (`votenet_DA.py:31-44`)."""
    return x


def _gr_fwd(x):
    return x, None


def _gr_bwd(_, g):
    return (jax.tree.map(lambda t: -t, g),)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)


class _ConvBNStack(nn.Module):
    """Dense+BN+ReLU layers, optional linear out layer."""

    hidden: tuple
    out: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, bn_momentum=0.1):
        for i, ch in enumerate(self.hidden):
            # no bias before BN (see voting.py)
            x = nn.Dense(ch, use_bias=False,
                         kernel_init=torch_default_kernel_init,
                         dtype=self.dtype, name=f"dense{i}")(x)
            x = BatchNorm(ch, dtype=self.dtype, name=f"bn{i}")(
                x, train=train, momentum=bn_momentum)
            x = nn.relu(x)
        if self.out is not None:
            x = nn.Dense(self.out, use_bias=True, dtype=self.dtype,
                         kernel_init=torch_default_kernel_init,
                         bias_init=torch_default_bias_init(x.shape[-1]),
                         name="out")(x)
        return x


class _DAHeads(nn.Module):
    """Global + local domain discriminators shared by both variants."""

    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.global_netD1 = _ConvBNStack((256, 128), dtype=self.dtype)
        self.global_netD2 = nn.Dense(
            2, dtype=self.dtype,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(128))
        self.local_netD = _ConvBNStack((128, 128), out=1, dtype=self.dtype)

    def __call__(self, end_points, *, train: bool, bn_momentum=0.1):
        g = self.global_netD1(
            grad_reverse(end_points["seed_features"]), train=train,
            bn_momentum=bn_momentum)  # (B, 1024, 128)
        g = jnp.mean(g, axis=1)  # (B, 128)
        end_points["global_d_pred"] = self.global_netD2(g)  # (B, 2)

        l = self.local_netD(
            grad_reverse(end_points["aggregated_vote_features"]),
            train=train, bn_momentum=bn_momentum)  # (B, K, 1)
        end_points["local_d_pred"] = jax.nn.sigmoid(l)
        return end_points


class VoteNetDA(nn.Module):
    """`VoteNet_DA` (`votenet_DA.py:47-176`)."""

    num_class: int
    num_heading_bin: int
    num_size_cluster: int
    mean_size_arr: tuple
    input_feature_dim: int = 0
    num_proposal: int = 256
    vote_factor: int = 1
    sampling: str = "vote_fps"
    query_mode: str = "stratified"
    fps_candidates: int | None = None
    dtype: jnp.dtype = jnp.float32
    head_dtype: jnp.dtype = jnp.float32  # see votenet.VoteNet.head_dtype
    f32_tail: int = 0  # see Pointnet2Backbone.f32_tail

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
        self.da_heads = _DAHeads(dtype=self.dtype)

    def __call__(self, point_clouds, rng=None, *, train: bool,
                 bn_momentum=0.1):
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
        return self.da_heads(
            end_points, train=train, bn_momentum=bn_momentum)


class VoteNetDAJitter2(nn.Module):
    """`VoteNet_DA_jitter2` (`votenet_DA.py:335-487`): like the jitter
    variant, but the center-jitter head groups *aggregated vote*
    features (detached) around the GT centers instead of backbone sa2
    features — the plain backbone is used."""

    num_class: int
    num_heading_bin: int
    num_size_cluster: int
    mean_size_arr: tuple
    input_feature_dim: int = 0
    num_proposal: int = 256
    vote_factor: int = 1
    sampling: str = "vote_fps"
    query_mode: str = "stratified"
    fps_candidates: int | None = None
    dtype: jnp.dtype = jnp.float32
    head_dtype: jnp.dtype = jnp.float32  # see votenet.VoteNet.head_dtype
    f32_tail: int = 0  # see Pointnet2Backbone.f32_tail

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
        self.da_heads = _DAHeads(dtype=self.dtype)
        # ctjt over aggregated votes (`votenet_DA.py:412-419`)
        from backtoreality_tpu.nn import SAModuleCenters

        self.ctjt_head = SAModuleCenters(
            radius=0.8, nsample=16, mlp=[128], use_xyz=True,
            normalize_xyz=False, query_mode=self.query_mode,
            dtype=self.dtype)
        self.jitter_net = _ConvBNStack((64,), out=3,
                                       dtype=self.head_dtype)

    def __call__(self, point_clouds, center_label, sem_cls_label,
                 rng=None, *, train: bool, bn_momentum=0.1):
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
        end_points = self.da_heads(
            end_points, train=train, bn_momentum=bn_momentum)

        # jitter head off (detached) aggregated votes
        cf = self.ctjt_head(
            end_points["aggregated_vote_xyz"],
            jax.lax.stop_gradient(
                end_points["aggregated_vote_features"]),
            center_label, train=train, bn_momentum=bn_momentum)
        onehot = jnp.eye(self.num_class, dtype=cf.dtype)[
            sem_cls_label.astype(jnp.int32)]
        end_points["center_features"] = jnp.concatenate(
            [cf, onehot], axis=-1)
        end_points["jitter_pred"] = self.jitter_net(
            end_points["center_features"], train=train,
            bn_momentum=bn_momentum)
        return end_points


class VoteNetDAJitter(nn.Module):
    """`VoteNet_DA_jitter` (`votenet_DA.py:179-332`): DA + center-jitter
    prediction from GT-center-grouped features."""

    num_class: int
    num_heading_bin: int
    num_size_cluster: int
    mean_size_arr: tuple
    input_feature_dim: int = 0
    num_proposal: int = 256
    vote_factor: int = 1
    sampling: str = "vote_fps"
    query_mode: str = "stratified"
    fps_candidates: int | None = None
    dtype: jnp.dtype = jnp.float32
    head_dtype: jnp.dtype = jnp.float32  # see votenet.VoteNet.head_dtype
    f32_tail: int = 0  # see Pointnet2Backbone.f32_tail

    def setup(self):
        self.backbone_net = Pointnet2BackboneJitter(
            num_class=self.num_class,
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
        self.da_heads = _DAHeads(dtype=self.dtype)
        self.jitter_netD = _ConvBNStack((128, 128), out=1,
                                        dtype=self.dtype)
        self.jitter_net = _ConvBNStack((64,), out=3,
                                       dtype=self.head_dtype)

    def __call__(self, point_clouds, center_label, sem_cls_label,
                 rng=None, *, train: bool, bn_momentum=0.1):
        end_points = self.backbone_net(
            point_clouds, center_label, sem_cls_label, train=train,
            bn_momentum=bn_momentum)
        end_points["jitter_pred"] = self.jitter_net(
            end_points["center_features"], train=train,
            bn_momentum=bn_momentum)  # (B, K, 3)

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
        end_points = self.da_heads(
            end_points, train=train, bn_momentum=bn_momentum)

        jd = self.jitter_netD(
            grad_reverse(end_points["center_features"]), train=train,
            bn_momentum=bn_momentum)
        end_points["jitter_d_pred"] = jax.nn.sigmoid(jd)
        return end_points
