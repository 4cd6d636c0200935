"""Ball query: fixed-size neighborhoods within a radius.

Reference semantics (`detection/Votenet/pointnet2/_ext_src/src/ball_query_gpu.cu:14-59`):
for each query center, scan points in index order and record the first
``nsample`` indices with squared distance < radius^2; when the first hit is
found, *all* slots are pre-filled with it (slot-fill), so centers with
fewer than ``nsample`` hits repeat their first hit. A center with no hit
returns all-zeros here (the reference leaves the row uninitialised; any
value is consumed identically downstream because grouped features are
max-pooled).

Two query modes:

* :func:`ball_query` — exact reference semantics ("first k in index
  order"), implemented as a chunked top-k over an ordering key. This is
  the parity/testing path.
* :func:`ball_query_stratified` — a TPU-native variant: the N points are
  split into ``nsample`` contiguous buckets and each slot takes the first
  hit of its bucket (empty slots are filled with the globally first hit).
  Because detection clouds are randomly permuted by the input pipeline,
  this is a stratified sample of the same neighborhood with identical
  downstream semantics (neighborhoods feed a max/avg pool), but it runs as
  pure dense reductions with no top-k/sort. Used by the Pallas fast path.

Both are integer-valued and non-differentiable.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from backtoreality_tpu.ops._runtime import pallas_interpret

_BIG_NEG = -(2**30)


def _bucket_size(n: int, nsample: int) -> int:
    """Stratified-bucket width: ceil(n/nsample), lane-aligned to 128 so
    the Pallas kernel's bucketed reshape stays on the fast path. The
    bucket layout is part of the stratified semantics — the XLA
    implementation and the numpy oracle use the same width."""
    return max(-(-(-(-n // nsample)) // 128) * 128, 128)


def _pairwise_d2(new_xyz: jax.Array, xyz: jax.Array) -> jax.Array:
    """(..., M, 3) x (..., N, 3) -> (..., M, N) squared distances."""
    # |c - p|^2 = |c|^2 - 2 c.p + |p|^2 ; the cross term is a matmul (MXU).
    # HIGHEST precision: geometry must not drop to bf16 MXU passes — radius
    # classification is threshold-sensitive.
    cross = jnp.einsum(
        "...mc,...nc->...mn",
        new_xyz,
        xyz,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    c2 = jnp.sum(jnp.square(new_xyz), axis=-1)[..., :, None]
    p2 = jnp.sum(jnp.square(xyz), axis=-1)[..., None, :]
    return c2 - 2.0 * cross + p2


# ---------------------------------------------------------------------------
# Exact first-k (reference semantics)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def ball_query(
    xyz: jax.Array,
    new_xyz: jax.Array,
    radius: float,
    nsample: int,
    chunk: int = 256,
) -> jax.Array:
    """Exact reference ball query.

    Args:
      xyz: (B, N, 3) points.
      new_xyz: (B, M, 3) query centers.
      radius: ball radius (static).
      nsample: neighborhood slot count (static).
      chunk: centers processed per step to bound the (B, chunk, N)
        intermediate (static).

    Returns:
      (B, M, nsample) int32 indices into N.
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    # preserve f64 when given f64 (the x64 training-dynamics parity
    # test matches the reference stub's f64 distance comparisons);
    # production inputs are f32/bf16 and compute in f32 as before
    ct = jnp.float64 if xyz.dtype == jnp.float64 else jnp.float32
    r2 = jnp.asarray(radius * radius, ct)
    xyz = xyz.astype(ct)
    new_xyz = new_xyz.astype(ct)

    chunk = min(chunk, m)
    num_chunks = -(-m // chunk)
    m_pad = num_chunks * chunk
    if m_pad != m:
        pad = jnp.zeros((b, m_pad - m, 3), ct)
        new_xyz = jnp.concatenate([new_xyz, pad], axis=1)

    j = jnp.arange(n, dtype=jnp.int32)
    slot = jnp.arange(nsample, dtype=jnp.int32)

    def one_chunk(centers):  # (B, chunk, 3) -> (B, chunk, nsample)
        if ct == jnp.float64:
            # direct form: the expanded form's cancellation error flips
            # membership of points near the radius boundary vs the
            # reference's direct-form distance test (x64 parity tests)
            d2 = jnp.sum(
                jnp.square(centers[:, :, None, :] - xyz[:, None, :, :]),
                axis=-1)
        else:
            d2 = _pairwise_d2(centers, xyz)  # (B, chunk, N)
        mask = d2 < r2
        # Hits rank above misses; within each group the key decreases with
        # index, so top-k (descending, stable) yields "first k in index
        # order" and its `indices` output is exactly the point index.
        key = jnp.where(mask, 2 * n - j, n - j).astype(jnp.int32)
        _, idx = jax.lax.top_k(key, nsample)  # (B, chunk, nsample)
        idx = idx.astype(jnp.int32)
        cnt = jnp.sum(mask, axis=-1, dtype=jnp.int32)  # (B, chunk)
        fill = idx[..., 0:1]
        return jnp.where(slot < cnt[..., None], idx, fill)

    chunks = jnp.moveaxis(
        new_xyz.reshape(b, num_chunks, chunk, 3), 1, 0
    )  # (num_chunks, B, chunk, 3)
    out = jax.lax.map(one_chunk, chunks)  # (num_chunks, B, chunk, nsample)
    out = jnp.moveaxis(out, 0, 1).reshape(b, m_pad, nsample)
    return out[:, :m]


# ---------------------------------------------------------------------------
# Stratified variant (TPU-native production path)
# ---------------------------------------------------------------------------


def _stratified_math(d2, r2, n, nsample, bucket):
    """Shared math for the XLA and Pallas stratified implementations.

    d2: (..., M, S*bucket) squared distances (padded with +inf).
    Returns (..., M, S) int32 indices.
    """
    mask = d2 < r2
    shape = mask.shape[:-1] + (nsample, bucket)
    mask_b = mask.reshape(shape)
    pos = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    # First hit within each bucket: maximise -pos over hits.
    key = jnp.where(mask_b, -pos, _BIG_NEG)
    best = jnp.max(key, axis=-1)  # (..., M, S)
    has_hit = best > _BIG_NEG
    base = jnp.arange(nsample, dtype=jnp.int32) * bucket
    local = jnp.where(has_hit, -best, 0)
    idx = base + local  # (..., M, S)
    # Global first hit = first hit of the first non-empty bucket
    # (buckets are contiguous index ranges, so this IS the global first).
    sidx = jnp.arange(nsample, dtype=jnp.int32)
    bbest = jnp.max(jnp.where(has_hit, -sidx, _BIG_NEG), axis=-1,
                    keepdims=True)
    first_bucket = jnp.where(bbest > _BIG_NEG, -bbest, 0)  # (..., M, 1)
    # One-hot extraction (gather-free: works identically under Pallas).
    fill = jnp.sum(
        jnp.where(sidx == first_bucket, idx, 0), axis=-1, keepdims=True
    )
    out = jnp.where(has_hit, idx, fill)
    return jnp.minimum(out, n - 1).astype(jnp.int32), has_hit


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _ball_query_stratified_xla(
    xyz: jax.Array,
    new_xyz: jax.Array,
    radius: float,
    nsample: int,
    chunk: int = 256,
) -> jax.Array:
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    r2 = jnp.float32(radius * radius)
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)

    bucket = _bucket_size(n, nsample)
    n_pad = bucket * nsample
    if n_pad != n:
        # Pad far away so padded entries never register as hits.
        pad = jnp.full((b, n_pad - n, 3), 1e6, jnp.float32)
        xyz_p = jnp.concatenate([xyz, pad], axis=1)
    else:
        xyz_p = xyz

    chunk = min(chunk, m)
    num_chunks = -(-m // chunk)
    m_pad = num_chunks * chunk
    if m_pad != m:
        pad = jnp.zeros((b, m_pad - m, 3), jnp.float32)
        new_xyz = jnp.concatenate([new_xyz, pad], axis=1)

    def one_chunk(centers):
        d2 = _pairwise_d2(centers, xyz_p)  # (B, chunk, n_pad)
        return _stratified_math(d2, r2, n, nsample, bucket)

    chunks = jnp.moveaxis(new_xyz.reshape(b, num_chunks, chunk, 3), 1, 0)
    out, hit = jax.lax.map(one_chunk, chunks)
    out = jnp.moveaxis(out, 0, 1).reshape(b, m_pad, nsample)
    hit = jnp.moveaxis(hit, 0, 1).reshape(b, m_pad, nsample)
    return out[:, :m], hit[:, :m]


def _split_hi_lo(x):
    """f32 -> (hi, lo) bf16 factors via a Veltkamp split in PURE f32
    arithmetic: t = x * (2^16 + 1); hi = t - (t - x); lo = x - hi.
    `hi` keeps the top 8 mantissa bits (bf16-exact), `lo` the rest.
    The obvious `bf16(x); x - f32(bf16(x))` is ELIDED by XLA under
    --xla_allow_excess_precision (zeroing `lo` silently), and bitcast/
    integer masking hits an emulation slow path on this backend —
    arithmetic splitting is both correct and fast."""
    t = x * jnp.float32(65537.0)
    hi = t - (t - x)
    return hi.astype(jnp.bfloat16), (x - hi).astype(jnp.bfloat16)


def _bq_stratified_kernel(
    pcat_ref, thresh_ref, negpos_ref, ccat_ref, idx_ref, hit_ref,
    *, nsample, bucket
):
    # pcat_ref:   (1, 16, n_pad) bf16 stacked point factors (wrapper).
    # thresh_ref: (1, 1, n_pad) precomputed (|p|^2 - r^2) / 2 row.
    # negpos_ref: (1, 1, n_pad) precomputed -(i % bucket) row — integer
    #             mod is a multi-op division sequence on the VPU and this
    #             row is constant across all grid cells, so it is hoisted
    #             out of the kernel entirely.
    # ccat_ref:   (1, mb, 16) bf16 stacked center factors.
    # idx_ref:    (1, mb, S) per-slot first-hit index (global)
    # hit_ref:    (1, mb, S) 1 where the slot's bucket had a hit
    #
    # The radius test |c-p|^2 < r^2 is algebraically
    #     c.p - |c|^2/2  >  (|p|^2 - r^2)/2
    # and the LEFT side comes out of ONE MXU matmul: centers carry a
    # 4th coordinate -|c|^2/2 (against the points' ones-row), and the
    # f32->bf16 hi/lo correction terms (hi*hi + hi*lo + lo*hi,
    # f32-equivalent accuracy ~1e-5 abs) are stacked along the
    # CONTRACTION axis so a single K=16 bf16 dot computes their sum —
    # one MXU pass and one (mb, n_pad) accumulator versus six for a
    # HIGHEST-precision f32 dot (~2x kernel speedup measured).
    mb = ccat_ref.shape[1]
    lhs = jax.lax.dot_general(
        ccat_ref[0], pcat_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (mb, n_pad) == c.p - |c|^2/2  (3-term compensated product)
    key = jnp.where(lhs > thresh_ref[0], negpos_ref[0], _BIG_NEG)
    best = jnp.max(key.reshape(mb, nsample, bucket), axis=2)  # (mb, S)
    has = best > _BIG_NEG
    local = jnp.where(has, -best, 0)
    base = jax.lax.broadcasted_iota(jnp.int32, (mb, nsample), 1) * bucket
    idx_ref[0] = (base + local).astype(jnp.int32)
    hit_ref[0] = has.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _ball_query_stratified_pallas(
    xyz: jax.Array,
    new_xyz: jax.Array,
    radius: float,
    nsample: int,
    mb: int = 64,
) -> jax.Array:
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    bucket = _bucket_size(n, nsample)
    n_pad = bucket * nsample
    xyz = xyz.astype(jnp.float32)
    if n_pad != n:
        pad = jnp.full((b, n_pad - n, 3), 1e6, jnp.float32)
        xyz = jnp.concatenate([xyz, pad], axis=1)
    xyzt = jnp.transpose(xyz, (0, 2, 1))  # (B, 3, n_pad)
    ones = jnp.ones((b, 1, n_pad), jnp.float32)
    xyzt1 = jnp.concatenate([xyzt, ones], axis=1)  # (B, 4, n_pad)
    p_hi, p_lo = _split_hi_lo(xyzt1)
    pcat = jnp.concatenate(
        [p_hi, p_lo, p_hi, jnp.zeros((b, 4, n_pad), jnp.bfloat16)],
        axis=1)  # (B, 16, n_pad): hi*hi + hi*lo + lo*hi (+4 zero rows)
    p2 = jnp.sum(jnp.square(xyzt), axis=1, keepdims=True)
    thresh = 0.5 * (p2 - radius * radius)  # (B, 1, n_pad)
    negpos = -(jnp.arange(n_pad, dtype=jnp.int32)
               % bucket)[None, None, :]  # (1, 1, n_pad)

    mb = min(mb, m)
    num_mb = -(-m // mb)
    m_pad = num_mb * mb
    new_xyz = new_xyz.astype(jnp.float32)
    if m_pad != m:
        pad = jnp.zeros((b, m_pad - m, 3), jnp.float32)
        new_xyz = jnp.concatenate([new_xyz, pad], axis=1)
    c2half = 0.5 * jnp.sum(jnp.square(new_xyz), axis=-1, keepdims=True)
    cap = jnp.concatenate([new_xyz, -c2half], axis=-1)  # (B, m_pad, 4)
    cap_hi, cap_lo = _split_hi_lo(cap)
    ccat = jnp.concatenate(
        [cap_hi, cap_hi, cap_lo,
         jnp.zeros((b, m_pad, 4), jnp.bfloat16)], axis=-1)  # (B,m_pad,16)

    kernel = functools.partial(
        _bq_stratified_kernel,
        nsample=nsample,
        bucket=bucket,
    )
    idx, hit = pl.pallas_call(
        kernel,
        grid=(b, num_mb),
        in_specs=[
            pl.BlockSpec((1, 16, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mb, 16), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, mb, nsample), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mb, nsample), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, m_pad, nsample), jnp.int32),
            jax.ShapeDtypeStruct((b, m_pad, nsample), jnp.int32),
        ),
        interpret=pallas_interpret(),
    )(pcat, thresh, negpos, ccat)
    idx, hit = idx[:, :m], hit[:, :m] > 0
    # Slot-fill (XLA side, tiny): empty slots take the globally first hit,
    # i.e. the first hit of the first non-empty bucket.
    sidx = jnp.arange(nsample, dtype=jnp.int32)
    bbest = jnp.max(jnp.where(hit, -sidx, _BIG_NEG), axis=-1, keepdims=True)
    first_bucket = jnp.where(bbest > _BIG_NEG, -bbest, 0)
    fill = jnp.sum(
        jnp.where(sidx == first_bucket, idx, 0), axis=-1, keepdims=True
    )
    out = jnp.where(hit, idx, fill)
    return jnp.minimum(out, n - 1).astype(jnp.int32), hit


def ball_query_stratified(
    xyz: jax.Array,
    new_xyz: jax.Array,
    radius: float,
    nsample: int,
    *,
    use_pallas: bool | None = None,
    return_hit: bool = False,
):
    """Bucketed ball query (see module docstring). (B, M, nsample) int32.

    With ``return_hit=True`` also returns the (B, M, nsample) bool mask of
    slots whose bucket had a real hit (False = slot-filled / empty). The
    mask is what :func:`backtoreality_tpu.ops.group_points_stratified`
    consumes for gather-free grouping.
    """
    # Integer-valued op — cut the AD path (see furthest_point_sample).
    xyz = jax.lax.stop_gradient(xyz)
    new_xyz = jax.lax.stop_gradient(new_xyz)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        idx, hit = _ball_query_stratified_pallas(
            xyz, new_xyz, radius, nsample)
    else:
        idx, hit = _ball_query_stratified_xla(xyz, new_xyz, radius, nsample)
    return (idx, hit) if return_hit else idx
