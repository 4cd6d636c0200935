"""Index gathers for point sets.

Replaces the reference CUDA ops `gather_points` / `group_points`
(`sampling_gpu.cu:13-62`, `group_points_gpu.cu:13-86`) and their
atomic-add backward kernels. On TPU these are plain XLA gathers whose
autodiff transpose is a deterministic scatter-add — no custom VJP needed.

Layout note: the reference is channels-first (B, C, N); this framework is
channels-last (B, N, C) so the channel dimension rides the 128-lane axis.
"""

import jax
import jax.numpy as jnp


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather (B, N, C) by (B, M) -> (B, M, C). Differentiable in `points`."""
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32),
                               axis=1)


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather (B, N, C) by (B, M, S) -> (B, M, S, C).

    Differentiable in `points` (transpose = scatter-add, matching the
    reference `group_points_grad` atomicAdd semantics deterministically).
    """
    b, n, c = points.shape
    m, s = idx.shape[1], idx.shape[2]
    flat = jnp.take_along_axis(
        points, idx.reshape(b, m * s, 1).astype(jnp.int32), axis=1
    )
    return flat.reshape(b, m, s, c)
