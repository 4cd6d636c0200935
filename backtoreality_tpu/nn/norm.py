"""Batch normalization with torch-style momentum and schedule support.

The reference trains BN with an epoch-wise momentum schedule
(`pytorch_utils.py:262-297`, driven at `train_Votenet_FSB.py:186-189`:
0.5 decayed x0.5 every 20 epochs, floor 0.001). Torch semantics:

    running = (1 - momentum) * running + momentum * batch_stat

(opposite convention to flax's BatchNorm). Here momentum is a *call-time
scalar* (can be a traced array) so the schedule never retriggers
compilation.

Cross-replica stats: when the train step is jitted over a device mesh
with the batch sharded on a 'data' axis, XLA computes the batch moments
globally — the natural TPU equivalent of SyncBatchNorm
(`detector.py:124-125`). An explicit `axis_name` is supported for
shard_map-style use.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn


def bn_momentum_schedule(
    epoch,
    init: float = 0.5,
    decay_step: int = 20,
    decay_rate: float = 0.5,
    floor: float = 0.001,
):
    """Reference BN momentum schedule (`train_Votenet_FSB.py:91-95`)."""
    m = init * decay_rate ** (epoch // decay_step)
    return jnp.maximum(m, floor) if isinstance(epoch, jax.Array) else max(
        m, floor
    )


class BatchNorm(nn.Module):
    """Torch-semantics BatchNorm over the channel (last) axis.

    Normalizes over all non-channel axes. gamma init 1, beta init 0
    (`pytorch_utils.py:45-46`), eps 1e-5 (torch default). Running var is
    updated with the unbiased batch variance, normalization uses the
    biased one (torch behavior).
    """

    features: int
    epsilon: float = 1e-5
    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, momentum=0.1):
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros(self.features, jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones(self.features, jnp.float32),
        )
        scale = self.param(
            "scale", lambda key: jnp.ones(self.features, jnp.float32)
        )
        bias = self.param(
            "bias", lambda key: jnp.zeros(self.features, jnp.float32)
        )

        reduce_axes = tuple(range(x.ndim - 1))
        ct = jnp.promote_types(x.dtype, jnp.float32)  # f32, or f64 in
        # the x64 parity tests — never compute stats in bf16
        if train:
            xf = x.astype(ct)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            count = 1
            for ax in reduce_axes:
                count *= x.shape[ax]
            if self.axis_name is not None:
                count *= jax.lax.psum(1, self.axis_name)
            unbiased = var * (count / max(count - 1, 1))
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(ct) - mean) * inv + bias
        return y.astype(x.dtype)
