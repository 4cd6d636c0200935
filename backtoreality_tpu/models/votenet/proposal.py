"""Proposal module: vote clustering + box-parameter head.

Re-design of `detection/Votenet/models/proposal_module.py:18-120`:
an SA layer clusters votes around `num_proposal` sampled centers
(sampling in {vote_fps, seed_fps, random}); a pointwise head emits
2 objectness + 3 center-offset + 2*NH heading + 4*NS size + num_class
semantic logits, decoded into the end_points dict.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn
from backtoreality_tpu.nn.mlp import (
    torch_default_bias_init,
    torch_default_kernel_init,
)

from backtoreality_tpu import ops
from backtoreality_tpu.nn import SAModuleVotes, BatchNorm


def decode_scores(net, end_points, num_class, num_heading_bin,
                  num_size_cluster, mean_size_arr):
    """`proposal_module.py:18-50`. net: (B, K, 2+3+NH*2+NS*4+num_class)."""
    nh, ns = num_heading_bin, num_size_cluster
    end_points["objectness_scores"] = net[..., 0:2]

    base_xyz = end_points["aggregated_vote_xyz"]  # (B, K, 3)
    end_points["center"] = base_xyz + net[..., 2:5]

    heading_scores = net[..., 5:5 + nh]
    heading_residuals_normalized = net[..., 5 + nh:5 + nh * 2]
    end_points["heading_scores"] = heading_scores
    end_points["heading_residuals_normalized"] = (
        heading_residuals_normalized)
    end_points["heading_residuals"] = (
        heading_residuals_normalized * (jnp.pi / nh))

    b, k = net.shape[0], net.shape[1]
    size_scores = net[..., 5 + nh * 2:5 + nh * 2 + ns]
    size_residuals_normalized = net[
        ..., 5 + nh * 2 + ns:5 + nh * 2 + ns * 4
    ].reshape(b, k, ns, 3)
    end_points["size_scores"] = size_scores
    end_points["size_residuals_normalized"] = size_residuals_normalized
    msa = jnp.asarray(mean_size_arr, net.dtype)[None, None]  # (1,1,NS,3)
    end_points["size_residuals"] = size_residuals_normalized * msa
    size_recover = msa + end_points["size_residuals"]
    pred_size_class = jnp.argmax(size_scores, -1)  # (B, K)
    pred_size = jnp.take_along_axis(
        size_recover, pred_size_class[..., None, None], axis=2
    )[:, :, 0, :]
    end_points["pred_size"] = pred_size

    end_points["sem_cls_scores"] = net[..., 5 + nh * 2 + ns * 4:]
    return end_points


class ProposalModule(nn.Module):
    num_class: int
    num_heading_bin: int
    num_size_cluster: int
    mean_size_arr: tuple  # nested tuple (hashable) or set via jnp at call
    num_proposal: int = 256
    sampling: str = "vote_fps"
    seed_feat_dim: int = 256
    query_mode: str = "stratified"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, features, end_points, rng=None, *,
                 train: bool, bn_momentum=0.1):
        """xyz: vote positions (B, num_vote, 3); features (B, num_vote, C)."""
        vote_aggregation = SAModuleVotes(
            npoint=self.num_proposal, radius=0.3, nsample=16,
            mlp=[128, 128, 128], use_xyz=True, normalize_xyz=True,
            query_mode=self.query_mode, dtype=self.dtype,
            name="vote_aggregation")

        if self.sampling == "vote_fps":
            new_xyz, new_features, sample_inds = vote_aggregation(
                xyz, features, train=train, bn_momentum=bn_momentum)
        elif self.sampling == "seed_fps":
            sample_inds = ops.furthest_point_sample(
                end_points["seed_xyz"], self.num_proposal)
            new_xyz, new_features, _ = vote_aggregation(
                xyz, features, sample_inds, train=train,
                bn_momentum=bn_momentum)
        elif self.sampling == "random":
            assert rng is not None, "random sampling needs an rng key"
            num_seed = end_points["seed_xyz"].shape[1]
            b = xyz.shape[0]
            sample_inds = jax.random.randint(
                rng, (b, self.num_proposal), 0, num_seed, dtype=jnp.int32)
            new_xyz, new_features, _ = vote_aggregation(
                xyz, features, sample_inds, train=train,
                bn_momentum=bn_momentum)
        else:
            raise ValueError(f"unknown sampling {self.sampling!r}")

        end_points["aggregated_vote_xyz"] = new_xyz
        end_points["aggregated_vote_features"] = new_features
        end_points["aggregated_vote_inds"] = sample_inds

        net = new_features
        for i in range(2):
            # no bias before BN (see voting.py; reference biases
            # fold into BN running means at transplant)
            net = nn.Dense(128, use_bias=False,
                           kernel_init=torch_default_kernel_init,
                           dtype=self.dtype, name=f"dense{i}")(net)
            net = BatchNorm(128, dtype=self.dtype, name=f"bn{i}")(
                net, train=train, momentum=bn_momentum)
            net = nn.relu(net)
        out_dim = (2 + 3 + self.num_heading_bin * 2
                   + self.num_size_cluster * 4 + self.num_class)
        net = nn.Dense(out_dim, use_bias=True,
                       kernel_init=torch_default_kernel_init,
                       bias_init=torch_default_bias_init(net.shape[-1]),
                       dtype=self.dtype, name="out")(net)

        # decode in f32 (or f64 under the x64 parity tests) — never in
        # the model compute dtype (bf16 residuals lose box precision)
        dt = jnp.float64 if net.dtype == jnp.float64 else jnp.float32
        return decode_scores(
            net.astype(dt), end_points, self.num_class,
            self.num_heading_bin, self.num_size_cluster,
            jnp.asarray(self.mean_size_arr, dt))
