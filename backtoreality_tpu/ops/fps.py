"""Furthest point sampling.

Semantics match the reference CUDA kernel
(`detection/Votenet/pointnet2/_ext_src/src/sampling_gpu.cu:74-177`):

* the first sample is always index 0;
* points with squared norm <= 1e-3 are skipped (the padding convention —
  clouds are padded with points at/near the origin);
* each of the remaining ``npoint - 1`` iterations picks the point whose
  min-distance to the already-chosen set is largest (ties -> lowest index,
  and if every point is a padding point the kernel returns index 0).

The op is integer-valued and non-differentiable (reference marks the
backward as None, `pointnet2_utils.py:75-77`).

Two implementations:

* :func:`_fps_xla` — a ``lax.fori_loop`` over the sample dimension with a
  masked argmax, batched over B. Runs on any backend.
* :func:`_fps_pallas` — a Pallas TPU kernel that keeps coordinates and the
  running min-distance field resident in VMEM across all iterations,
  processing the whole batch per step (B on the sublane axis, N on lanes).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from backtoreality_tpu.ops._runtime import pallas_interpret

_PAD_NORM2 = 1e-3  # squared-norm threshold below which a point is padding
_BIG = 1e10


def _valid_mask(xyz: jax.Array) -> jax.Array:
    """(B, N) bool — True for points that participate in FPS."""
    return jnp.sum(xyz * xyz, axis=-1) > _PAD_NORM2


# ---------------------------------------------------------------------------
# Pure-XLA implementation
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1,))
def _fps_xla(xyz: jax.Array, npoint: int) -> jax.Array:
    b, n, _ = xyz.shape
    if xyz.dtype != jnp.float64:  # f64 preserved for x64 parity tests
        xyz = xyz.astype(jnp.float32)
    valid = _valid_mask(xyz)
    batch_iota = jnp.arange(b)

    def body(j, carry):
        mindist, last, idxs = carry
        ref = xyz[batch_iota, last]  # (B, 3)
        d = jnp.sum(jnp.square(xyz - ref[:, None, :]), axis=-1)  # (B, N)
        mindist = jnp.minimum(mindist, d)
        # Padding points never win the argmax: their key is pinned to -1
        # (< any d >= 0); an all-padding row degenerates to index 0 like
        # the reference kernel.
        nxt = jnp.argmax(mindist, axis=-1).astype(jnp.int32)
        idxs = idxs.at[:, j].set(nxt)
        return mindist, nxt, idxs

    init = (
        jnp.where(valid, _BIG, -1.0).astype(xyz.dtype),
        jnp.zeros((b,), dtype=jnp.int32),
        jnp.zeros((b, npoint), dtype=jnp.int32),
    )
    _, _, idxs = jax.lax.fori_loop(1, npoint, body, init)
    return idxs


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------
#
# One kernel invocation handles the full batch: coordinates are
# pre-transposed to (3, B, N) so each coordinate plane is a (B, N) tile with
# B on sublanes and N on lanes — every per-iteration pass is a dense VPU
# sweep at full lane utilisation. The sequential dependence over the sample
# dimension stays on-chip: the min-distance field lives in VMEM for all
# `npoint` iterations (no HBM round-trips, unlike a lax.fori_loop which
# re-materialises the carry each step).


def _fps_kernel(xyzt_ref, out_ref, mind_ref):
    # xyzt_ref: (3, B, N)   out_ref: (B, npoint) i32
    # mind_ref: (B, N) matching-dtype scratch.
    # NOTE: compute_dtype=bf16 would halve the per-pass VMEM bandwidth,
    # but this jax version's Mosaic miscompiles i1 masks under bf16
    # tiling ("invalid relayout ... vector<...xi1>"); f32 only for now.
    b, n = mind_ref.shape
    npoint = out_ref.shape[1]

    x = xyzt_ref[0]
    y = xyzt_ref[1]
    z = xyzt_ref[2]
    norm2 = x * x + y * y + z * z
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, npoint), 1)

    # Invalid (padding) points carry a permanently negative min-distance so
    # they can never win the argmax; d >= 0 keeps them pinned at -1.
    # (arithmetic select: an i1-mask jnp.where trips a Mosaic relayout
    # bug under bf16 tiling)
    valid = (norm2 > _PAD_NORM2).astype(x.dtype)
    mind_ref[:, :] = valid * (_BIG + 1.0) - 1.0
    out_ref[:, :] = jnp.zeros((b, npoint), dtype=jnp.int32)

    def body(j, last):
        # last: (B, 1) int32 — previously selected index per batch row.
        eq = (lane == last).astype(x.dtype)
        x1 = jnp.sum(x * eq, axis=1, keepdims=True)
        y1 = jnp.sum(y * eq, axis=1, keepdims=True)
        z1 = jnp.sum(z * eq, axis=1, keepdims=True)
        d = (
            jnp.square(x - x1)
            + jnp.square(y - y1)
            + jnp.square(z - z1)
        )
        mind = jnp.minimum(mind_ref[:, :], d)
        mind_ref[:, :] = mind
        best = jnp.max(mind, axis=1, keepdims=True)  # (B, 1)
        # lowest index achieving the max (reference tie-breaking)
        nxt = jnp.min(
            jnp.where(mind == best, lane, n), axis=1, keepdims=True
        ).astype(jnp.int32)  # (B, 1)
        out_ref[:, :] = out_ref[:, :] + nxt * (col == j)
        return nxt

    jax.lax.fori_loop(
        1, npoint, body, jnp.zeros((b, 1), dtype=jnp.int32)
    )


def _fps_kernel_row(xyzt_ref, out_ref, mind_ref):
    # Capacity variant: ONE batch row per grid step, the row's N points
    # laid out as (S sublane-tiles, 128 lanes) so VMEM holds ~N*16B
    # regardless of batch size. xyzt_ref: (3, 1, S, 128);
    # out_ref: (1, 1, npoint) i32; mind_ref: (S, 128) scratch.
    s, lanes = mind_ref.shape
    n = s * lanes
    npoint = out_ref.shape[2]

    x = xyzt_ref[0, 0]
    y = xyzt_ref[1, 0]
    z = xyzt_ref[2, 0]
    norm2 = x * x + y * y + z * z
    sub = jax.lax.broadcasted_iota(jnp.int32, (s, lanes), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (s, lanes), 1)
    gidx = sub * lanes + lane  # global point index, row-major over N
    col = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)

    valid = (norm2 > _PAD_NORM2).astype(x.dtype)
    mind_ref[...] = valid * (_BIG + 1.0) - 1.0
    out_ref[...] = jnp.zeros((1, 1, npoint), dtype=jnp.int32)

    def _all2d(v, op):
        # reduce (S, 128) -> (1, 1) in two 2D stages (Mosaic dislikes
        # multi-axis keepdims reductions / rank-1 layouts)
        return op(op(v, axis=1, keepdims=True), axis=0, keepdims=True)

    def body(j, last):
        # last: (1, 1) int32 — previously selected global index.
        eq = (gidx == last).astype(x.dtype)
        x1 = _all2d(x * eq, jnp.sum)
        y1 = _all2d(y * eq, jnp.sum)
        z1 = _all2d(z * eq, jnp.sum)
        d = (
            jnp.square(x - x1)
            + jnp.square(y - y1)
            + jnp.square(z - z1)
        )
        mind = jnp.minimum(mind_ref[...], d)
        mind_ref[...] = mind
        best = _all2d(mind, jnp.max)  # (1, 1)
        nxt = _all2d(jnp.where(mind == best, gidx, n),
                     jnp.min).astype(jnp.int32)  # (1, 1)
        out_ref[...] = out_ref[...] + (nxt * (col == j))[None]
        return nxt

    jax.lax.fori_loop(
        1, npoint, body, jnp.zeros((1, 1), dtype=jnp.int32)
    )


# Empirical VMEM footprint of the whole-batch kernel is ~38 bytes per
# (row, point): 3 coordinate planes + the min-distance scratch + Mosaic
# temporaries (d/mind/eq/norm2 sweeps), measured against the 16 MB
# scoped-vmem limit (B=8, N=80128 allocates 24.25 MB => ~37.8 B/pt;
# B=8, N=50176 = 15.25 MB compiles and runs — the GF production size
# MUST stay on the whole-batch kernel: the per-row fallback costs
# ~33 ms vs ~8 ms there).
_FPS_VMEM_BYTES_PER_POINT = 38
_FPS_VMEM_BUDGET = 15_400_000


@functools.partial(jax.jit, static_argnums=(1, 2))
def _fps_pallas(xyz: jax.Array, npoint: int,
                compute_dtype=jnp.float32) -> jax.Array:
    b, n, _ = xyz.shape
    # Lane-align N (also sublane-align the per-row (S, 128) layout of
    # the capacity kernel): unaligned lane dims drive Mosaic into a
    # scalar slow path (~2000x at N=40000). Zero padding is the native
    # padding convention — padded points are skipped by the ||p||^2
    # rule.
    n_pad = -(-n // 1024) * 1024
    if n_pad != n:
        xyz = jnp.concatenate(
            [xyz, jnp.zeros((b, n_pad - n, 3), xyz.dtype)], axis=1)
    xyzt = jnp.transpose(xyz.astype(compute_dtype), (2, 0, 1))
    if _FPS_VMEM_BYTES_PER_POINT * n_pad * b <= _FPS_VMEM_BUDGET:
        # hot path: whole batch resident, B on sublanes, N on lanes
        return pl.pallas_call(
            _fps_kernel,
            out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((b, n_pad), compute_dtype)],
            interpret=pallas_interpret(),
        )(xyzt)
    # Point-dimension capacity (SURVEY §5.7): large N runs one batch
    # row per grid step so VMEM holds a single (S, 128) field.
    s = n_pad // 128
    out = pl.pallas_call(
        _fps_kernel_row,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, 1, npoint), jnp.int32),
        in_specs=[pl.BlockSpec((3, 1, s, 128),
                               lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, npoint), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((s, 128), compute_dtype)],
        interpret=pallas_interpret(),
    )(xyzt.reshape(3, b, s, 128))
    return out.reshape(b, npoint)


def furthest_point_sample(
    xyz: jax.Array,
    npoint: int,
    *,
    use_pallas: bool | None = None,
    candidates: int | None = None,
) -> jax.Array:
    """Iterative furthest point sampling.

    Args:
      xyz: (B, N, 3) point coordinates. Points with ||p||^2 <= 1e-3 are
        treated as padding and never sampled.
      npoint: number of samples to draw (static).
      use_pallas: force the Pallas TPU kernel on/off; default auto-selects
        by backend.
      candidates: optional throughput knob — run FPS over only the first
        `candidates` points. Because the input pipeline random-permutes
        clouds, the prefix is a uniform random subset, so this is the
        classic candidate-subset FPS approximation (coverage nearly
        identical at ~4x npoint, cost linear in `candidates`).

    Returns:
      (B, npoint) int32 indices into N. Index 0 is always the first sample.
    """
    # Integer-valued op: cut the AD path (the reference marks backward
    # None, `pointnet2_utils.py:75-77`) — vote-FPS runs on params-
    # dependent coordinates, and Pallas kernels have no JVP rule.
    xyz = jax.lax.stop_gradient(xyz)
    if candidates is not None and candidates < xyz.shape[1]:
        xyz = xyz[:, :candidates]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _fps_pallas(xyz, npoint)
    return _fps_xla(xyz, npoint)
