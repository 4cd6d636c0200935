"""Hough voting module (`detection/Votenet/models/voting_module.py:16-65`).

Per-seed MLP predicting `vote_factor` (xyz offset, residual feature)
pairs; votes = seed + offset, vote features = seed features + residual.
"""

import jax.numpy as jnp
from flax import linen as nn
from backtoreality_tpu.nn.mlp import (
    torch_default_bias_init,
    torch_default_kernel_init,
)

from backtoreality_tpu.nn import BatchNorm


class VotingModule(nn.Module):
    vote_factor: int = 1
    seed_feature_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seed_xyz, seed_features, *, train: bool,
                 bn_momentum=0.1):
        """seed_xyz (B, num_seed, 3); seed_features (B, num_seed, C).

        Returns vote_xyz (B, num_seed*vote_factor, 3) and vote_features
        (B, num_seed*vote_factor, C)."""
        b, num_seed, _ = seed_xyz.shape
        c = self.seed_feature_dim
        net = seed_features
        for i in range(2):
            # No bias before BN: the reference's plain Conv1d keeps
            # one, but it has zero training gradient (BN removes any
            # constant shift) and random-walks under Adam while the
            # running stats freeze — checkpoint transplant folds the
            # reference bias into the BN running mean instead.
            net = nn.Dense(c, use_bias=False,
                           kernel_init=torch_default_kernel_init,
                           dtype=self.dtype, name=f"dense{i}")(net)
            net = BatchNorm(c, dtype=self.dtype, name=f"bn{i}")(
                net, train=train, momentum=bn_momentum)
            net = nn.relu(net)
        net = nn.Dense((3 + c) * self.vote_factor, use_bias=True,
                       kernel_init=torch_default_kernel_init,
                       bias_init=torch_default_bias_init(net.shape[-1]),
                       dtype=self.dtype, name="out")(net)
        net = net.reshape(b, num_seed, self.vote_factor, 3 + c)
        offset = net[..., 0:3]
        vote_xyz = (seed_xyz[:, :, None, :] + offset).reshape(
            b, num_seed * self.vote_factor, 3)
        residual = net[..., 3:]
        vote_features = (seed_features[:, :, None, :] + residual).reshape(
            b, num_seed * self.vote_factor, c)
        return vote_xyz, vote_features
