"""Shared (pointwise) MLP stacks.

The reference's `SharedMLP` (`pytorch_utils.py:11-38`) is a stack of 1x1
Conv2d + BatchNorm + ReLU over channels-first maps. Channels-last on TPU,
a 1x1 conv IS a Dense layer on the trailing axis — each layer is a single
MXU matmul over every point/sample position. Kaiming-normal weight init
(`pytorch_utils.py:96-98`), bias only when BN is off (zero-init).
"""

import typing as tp

import jax.numpy as jnp
from flax import linen as nn

from backtoreality_tpu.nn.norm import BatchNorm


class SharedMLP(nn.Module):
    """Dense+BN+ReLU stack applied pointwise over the trailing axis.

    channels: output width per layer (input width is inferred).
    bn: apply BatchNorm after each Dense.
    final_activation: apply ReLU after the last layer too (the reference
      SharedMLP always activates every layer).
    """

    channels: tp.Sequence[int]
    bn: bool = True
    final_activation: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, bn_momentum=0.1):
        num = len(self.channels)
        for i, ch in enumerate(self.channels):
            x = nn.Dense(
                ch,
                use_bias=not self.bn,
                kernel_init=nn.initializers.he_normal(),
                dtype=self.dtype,
                name=f"dense{i}",
            )(x)
            if self.bn:
                x = BatchNorm(ch, dtype=self.dtype, name=f"bn{i}")(
                    x, train=train, momentum=bn_momentum
                )
            if i < num - 1 or self.final_activation:
                x = nn.relu(x)
        return x


# torch Conv1d/Linear DEFAULT init: kaiming_uniform(a=sqrt(5)) =
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for the kernel, same bounds for
# the bias. variance_scaling(1/3, fan_in, uniform) gives exactly that
# limit (sqrt(3 * (1/3) / fan_in)). The prediction heads
# (voting_module.py:33-37, proposal_module.py:80-85, GF PredictHead)
# use PLAIN torch layers, so this — not kaiming-normal — is the
# reference's head init; matching it matters for from-scratch training
# dynamics (measured: mAP 0.071 vs 0.0004 at 150 fixture epochs when
# starting from torch-default vs he_normal head inits).
torch_default_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_default_bias_init(fan_in: int):
    limit = float(fan_in) ** -0.5

    def init(key, shape, dtype=jnp.float32):
        from jax import random

        return random.uniform(key, shape, dtype, -limit, limit)

    return init


class PointwiseMLP(nn.Module):
    """Conv1d-style head: Dense(+BN+ReLU) x K then a linear Dense output.

    Mirrors the reference's `conv1 -> bn1 -> relu -> conv2 -> bn2 -> relu
    -> conv3` prediction-head pattern (e.g. `voting_module.py:33-37`,
    `proposal_module.py:80-85`): hidden layers use BN+ReLU, the final
    layer is a plain (biased) linear map. Uses the torch DEFAULT
    parameter init those plain layers get in the reference (the
    reference's pre-BN conv biases are folded into BN stats by the
    checkpoint importer, so hidden layers stay bias-free here).
    """

    hidden: tp.Sequence[int]
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, bn_momentum=0.1):
        for i, ch in enumerate(self.hidden):
            x = nn.Dense(
                ch,
                use_bias=False,
                kernel_init=torch_default_kernel_init,
                dtype=self.dtype,
                name=f"dense{i}",
            )(x)
            x = BatchNorm(ch, dtype=self.dtype, name=f"bn{i}")(
                x, train=train, momentum=bn_momentum
            )
            x = nn.relu(x)
        return nn.Dense(
            self.out,
            use_bias=True,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(x.shape[-1]),
            dtype=self.dtype,
            name="out",
        )(x)
