"""Chamfer / nearest-neighbor distance between point sets.

Replaces `detection/Votenet/utils/nn_distance.py:15-61` (used pervasively
by the loss stack). Dense (B, N, M) broadcast — on TPU the cross term is
an MXU matmul and XLA fuses the rest.
"""

import functools

import jax
import jax.numpy as jnp


def huber_loss(error: jax.Array, delta: float = 1.0) -> jax.Array:
    """Smooth-L1 (`utils/nn_distance.py:15-32`): quadratic within delta,
    linear outside. Elementwise."""
    abs_error = jnp.abs(error)
    quadratic = jnp.minimum(abs_error, delta)
    linear = abs_error - quadratic
    return 0.5 * quadratic**2 + delta * linear


@functools.partial(jax.jit, static_argnums=(2, 3))
def nn_distance(
    pc1: jax.Array,
    pc2: jax.Array,
    l1smooth: bool = False,
    l1: bool = False,
    delta: float = 1.0,
):
    """Bidirectional nearest-neighbor distance.

    Args:
      pc1: (B, N, C) points.
      pc2: (B, M, C) points.
      l1smooth: use huber distance per coordinate.
      l1: use |.| distance per coordinate.

    Returns:
      dist1: (B, N) distance from each pc1 point to its nearest pc2 point.
      idx1: (B, N) int32 index of that nearest neighbor.
      dist2: (B, M) distance from each pc2 point to its nearest pc1 point.
      idx2: (B, M) int32.
    """
    diff = pc1[:, :, None, :] - pc2[:, None, :, :]  # (B, N, M, C)
    if l1smooth:
        pc_dist = jnp.sum(huber_loss(diff, delta), axis=-1)
    elif l1:
        pc_dist = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        pc_dist = jnp.sum(jnp.square(diff), axis=-1)
    dist1 = jnp.min(pc_dist, axis=2)
    idx1 = jnp.argmin(pc_dist, axis=2).astype(jnp.int32)
    dist2 = jnp.min(pc_dist, axis=1)
    idx2 = jnp.argmin(pc_dist, axis=1).astype(jnp.int32)
    return dist1, idx1, dist2, idx2
