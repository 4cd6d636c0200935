"""Index gathers for point sets.

Replaces the reference CUDA ops `gather_points` / `group_points`
(`sampling_gpu.cu:13-62`, `group_points_gpu.cu:13-86`) and their
atomic-add backward kernels. On TPU these are plain XLA gathers whose
autodiff transpose is a deterministic scatter-add — no custom VJP needed.

Layout note: the reference is channels-first (B, C, N); this framework is
channels-last (B, N, C) so the channel dimension rides the 128-lane axis.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from backtoreality_tpu.ops._runtime import pallas_interpret
from backtoreality_tpu.ops.ball_query import _bucket_size

_BIG_NEG = -(2**30)


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


def sample_uniformly(idx: jax.Array, key: jax.Array):
    """Spread slot-fill duplicates uniformly over a region's found
    neighbors (`QueryAndGroup(sample_uniformly=True)`,
    `pointnet2_utils.py:336-345`; off by default and unused by every
    reference train path).

    The exact ball query fills unfound slots with a copy of the first
    in-radius index, so the first neighbor carries all the duplicate
    mass. The reference loops over regions, takes `torch.unique(idx)`,
    and refills the missing slots with uniform draws from the uniques.
    Batched TPU equivalent: found (distinct) neighbors occupy the slot
    prefix [0, cnt), every later slot equals idx[..., 0]; replace each
    fill slot with idx[..., j], j ~ U{0, .., cnt-1}. Slot ORDER differs
    from the reference (fills are refreshed in place instead of being
    concatenated after the uniques), but the sampled multiset
    distribution is identical and every grouping consumer is
    slot-permutation-invariant (max/avg/rbf pooling).

    Args:
      idx: (B, M, S) int32 from `ball_query` (first-k, slot-fill).
      key: jax PRNG key.

    Returns:
      (idx_resampled, unique_cnt): (B, M, S) int32 and (B, M) int32
      (the reference's `ret_unique_cnt` output).
    """
    s = idx.shape[-1]
    slot = jnp.arange(s, dtype=jnp.int32)
    # distinct neighbors = slot 0 plus any slot not equal to the fill
    # value idx[..., 0]
    valid = (slot == 0) | (idx != idx[..., :1])
    cnt = jnp.sum(valid, axis=-1).astype(jnp.int32)  # (B, M)
    u = jax.random.uniform(key, idx.shape)
    j = jnp.minimum((u * cnt[..., None]).astype(jnp.int32),
                    cnt[..., None] - 1)
    resampled = jnp.take_along_axis(idx, j, axis=-1)
    return jnp.where(valid, idx, resampled), cnt


# ---------------------------------------------------------------------------
# Gather-free grouping for stratified ball-query indices
# ---------------------------------------------------------------------------
#
# XLA's TPU gather runs on the scalar core at ~10-20 GB/s effective — it is
# the single hottest non-matmul op family in the backbone (profiled at
# ~12 ms of a 49 ms VoteNet train step). The stratified ball query gives a
# structure that removes the gather entirely: slot ``s`` of every
# neighborhood is guaranteed to come from point stratum ``s`` (a contiguous
# ``bucket``-wide index range), so grouping is a per-stratum one-hot
# contraction:
#
#     grouped[b, m, s, :] = onehot(idx[b,m,s] - s*bucket) @ points_stratum_s
#
# which the MXU executes as dense matmuls — and whose transpose (the
# backward) is another matmul instead of a scatter-add. Slots that were
# slot-filled by the ball query carry an out-of-stratum index, match no
# one-hot column, and are repaired from the first-hit slot afterwards
# (a tiny S-wide select), reproducing `group_points(points, idx)` exactly.


def _onehot_weights(idx, nsample, bucket, dtype):
    """(B, M, S) indices -> (B, S, M, bucket) one-hot; out-of-stratum
    (slot-filled) indices produce all-zero rows."""
    base = jnp.arange(nsample, dtype=jnp.int32) * bucket
    off = jnp.transpose(idx, (0, 2, 1)) - base[None, :, None]  # (B,S,M)
    k = jnp.arange(bucket, dtype=jnp.int32)
    return (off[..., None] == k).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _group_onehot(points_p, idx, nsample, bucket):
    """(B, S*bucket, C) x (B, M, S) -> (B, M, S, C); zero rows for
    slot-filled entries. HIGHEST precision keeps the pick bit-exact
    (the one-hot factor 1.0 is exact in every MXU pass)."""
    b, n_pad, c = points_p.shape
    pts = points_p.reshape(b, nsample, bucket, c)
    w = _onehot_weights(idx, nsample, bucket, points_p.dtype)
    g = jnp.einsum("bsmk,bskc->bsmc", w, pts,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.transpose(g, (0, 2, 1, 3))


def _group_onehot_fwd(points_p, idx, nsample, bucket):
    return _group_onehot(points_p, idx, nsample, bucket), idx


def _group_onehot_bwd(nsample, bucket, idx, gout):
    b, m, s, c = gout.shape
    w = _onehot_weights(idx, nsample, bucket, gout.dtype)  # (B,S,M,K)
    gp = jnp.einsum("bsmk,bmsc->bskc", w, gout,
                    precision=jax.lax.Precision.HIGHEST)
    gp = gp.reshape(b, nsample * bucket, c)
    return gp, np.zeros(idx.shape, jax.dtypes.float0)


_group_onehot.defvjp(_group_onehot_fwd, _group_onehot_bwd)


def _group_bucketed_kernel(ptsb_ref, idx_ref, out_ref, *, nsample, bucket):
    # ptsb_ref: (1, C, S, bucket) one batch row, stratum-major points
    # idx_ref:  (1, mb, S) global indices
    # out_ref:  (1, C, mb, S)
    mb = idx_ref.shape[1]
    c = ptsb_ref.shape[1]
    base = jax.lax.broadcasted_iota(jnp.int32, (mb, nsample), 1) * bucket
    off = idx_ref[0] - base  # (mb, S); out-of-stratum -> no match
    k = jax.lax.broadcasted_iota(jnp.int32, (mb, nsample, bucket), 2)
    w = (k == off[:, :, None]).astype(jnp.float32)
    for ci in range(c):  # C is small (xyz [+height/color]); VPU reduce
        row = ptsb_ref[0, ci]  # (S, bucket)
        out_ref[0, ci] = jnp.sum(w * row[None], axis=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _group_bucketed_pallas(points_p, idx, nsample, bucket, mb):
    b, n_pad, c = points_p.shape
    m = idx.shape[1]
    ptsb = jnp.transpose(
        points_p.reshape(b, nsample, bucket, c), (0, 3, 1, 2))
    num_mb = -(-m // mb)
    m_pad = num_mb * mb
    if m_pad != m:
        idx = jnp.concatenate(
            [idx, jnp.zeros((b, m_pad - m, nsample), jnp.int32)], axis=1)
    kernel = functools.partial(
        _group_bucketed_kernel, nsample=nsample, bucket=bucket)
    out = pl.pallas_call(
        kernel,
        grid=(b, num_mb),
        in_specs=[
            pl.BlockSpec((1, c, nsample, bucket), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mb, nsample), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, mb, nsample),
                               lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, m_pad, nsample), jnp.float32),
        interpret=pallas_interpret(),
    )(ptsb.astype(jnp.float32), idx.astype(jnp.int32))
    return jnp.transpose(out[:, :, :m], (0, 2, 3, 1)).astype(points_p.dtype)


def _group_bucketed_fwd(points_p, idx, nsample, bucket, mb):
    return _group_bucketed_pallas(points_p, idx, nsample, bucket, mb), idx


def _group_bucketed_bwd(nsample, bucket, mb, idx, gout):
    b, m, s, c = gout.shape
    w = _onehot_weights(idx, nsample, bucket, gout.dtype)
    gp = jnp.einsum("bsmk,bmsc->bskc", w, gout,
                    precision=jax.lax.Precision.HIGHEST)
    gp = gp.reshape(b, nsample * bucket, c)
    return gp, np.zeros(idx.shape, jax.dtypes.float0)


_group_bucketed_pallas.defvjp(_group_bucketed_fwd, _group_bucketed_bwd)


def group_points_stratified(
    points: jax.Array,
    idx: jax.Array,
    hit: jax.Array,
    *,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Gather-free `group_points` for stratified ball-query output.

    Args:
      points: (B, N, C) values to group.
      idx: (B, M, S) indices from
        ``ball_query_stratified(..., return_hit=True)``.
      hit: (B, M, S) bool mask from the same call.

    Returns:
      (B, M, S, C) == ``group_points(points, idx)``, but with the gather
      (and its backward scatter) replaced by one-hot contractions.
    """
    b, n, c = points.shape
    nsample = idx.shape[2]
    bucket = _bucket_size(n, nsample)
    n_pad = nsample * bucket
    points_p = (jnp.pad(points, ((0, 0), (0, n_pad - n), (0, 0)))
                if n_pad != n else points)
    # The XLA einsum path wins at every scale measured (XLA fuses the
    # one-hot generator into the contraction, so the (B,S,M,bucket)
    # weight tensor never hits HBM); the Pallas variant is kept as an
    # explicit opt-in and for the op-level tests.
    if use_pallas is None:
        use_pallas = False
    if use_pallas:
        g = _group_bucketed_pallas(points_p, idx, nsample, bucket, 32)
    else:
        g = _group_onehot(points_p, idx, nsample, bucket)
    # Repair slot-filled entries: copy the first-hit slot's row. A center
    # with no hit at all has idx[...,0] == 0 (in stratum 0), so its slot-0
    # row is points[0] and every slot copies it — matching group_points.
    sidx = jnp.arange(nsample, dtype=jnp.int32)
    bbest = jnp.max(jnp.where(hit, -sidx, _BIG_NEG), axis=-1,
                    keepdims=True)
    first = jnp.where(bbest > _BIG_NEG, -bbest, 0)  # (B, M, 1)
    gfirst = jnp.sum(
        jnp.where((sidx == first)[..., None], g, 0.0), axis=2,
        keepdims=True)
    return jnp.where(hit[..., None], g, gfirst)
