"""CPU torch stand-in for the reference's `pointnet2._ext` CUDA module.

Implementations with the exact kernel semantics (`_ext_src/src/*.cu`),
so the reference models can run on CPU for golden-activation parity
tests against the JAX models. The gather/group/interpolate ops also
provide the `*_grad` scatter-add kernels the reference's autograd
Functions call in backward, so the reference can TRAIN on CPU for the
training-dynamics parity test. Forward outputs are fresh contiguous
tensors (never views) — torch forbids in-place edits of views returned
from custom Functions, and `QueryAndGroup` subtracts centers in place
(`pointnet2_utils.py:350`)."""

import numpy as np
import torch


def furthest_point_sampling(xyz, npoint):
    """(B, N, 3) float -> (B, npoint) int32 (sampling_gpu.cu:74-177)."""
    x = xyz.detach().cpu().numpy().astype(np.float64)
    b, n, _ = x.shape
    out = np.zeros((b, npoint), dtype=np.int32)
    # batched over b (same per-batch semantics as a scalar loop):
    # one sequential sweep over npoint, vectorized distance updates
    valid = np.sum(x * x, axis=2) > 1e-3  # (b, n)
    temp = np.full((b, n), 1e10)
    old = np.zeros(b, dtype=np.int64)
    rows = np.arange(b)
    for j in range(1, npoint):
        d = np.sum((x - x[rows, old][:, None, :]) ** 2, axis=2)
        temp = np.minimum(temp, d)
        cand = np.where(valid, temp, -1.0)
        old = np.argmax(cand, axis=1)
        out[:, j] = old
    return torch.from_numpy(out)


def gather_points(points, idx):
    """(B, C, N) x (B, M) -> (B, C, M)."""
    b = points.shape[0]
    idx = idx.long()
    return torch.stack(
        [points[i][:, idx[i]] for i in range(b)]).contiguous().clone()


def gather_points_grad(grad_out, idx, n):
    """(B, C, M) x (B, M) -> (B, C, N) scatter-add
    (sampling_gpu.cu:47)."""
    b, c, m = grad_out.shape
    idx = idx.long().unsqueeze(1).expand(b, c, m)
    out = torch.zeros((b, c, n), dtype=grad_out.dtype)
    return out.scatter_add_(2, idx, grad_out)


def ball_query(new_xyz, xyz, radius, nsample):
    """-> (B, M, nsample) int32, first-k + slot-fill
    (ball_query_gpu.cu:14-59; zeros when no hit). Argument order
    matches `_ext.ball_query(new_xyz, xyz, radius, nsample)`
    (`pointnet2_utils.py:282`)."""
    x = xyz.detach().cpu().numpy()
    c = new_xyz.detach().cpu().numpy()
    b, n, _ = x.shape
    m = c.shape[1]
    out = np.zeros((b, m, nsample), dtype=np.int32)
    r2 = radius * radius
    for bi in range(b):
        d2 = np.sum(
            (c[bi][:, None, :] - x[bi][None, :, :]) ** 2, axis=-1)
        # vectorized first-k + slot-fill (same result as the per-row
        # `np.nonzero(...)[:nsample]` loop): misses get sentinel n,
        # an ascending partial sort yields the first-k hit indices
        idx = np.where(d2 < r2, np.arange(n)[None, :], n)
        k = min(nsample, n)
        part = np.partition(idx, k - 1, axis=1)[:, :k]
        part.sort(axis=1)
        first = part[:, :1]
        filled = np.where(part == n, first, part)
        filled = np.where(filled == n, 0, filled)  # no-hit rows -> 0
        out[bi, :, :k] = filled
        if k < nsample:  # fewer points than slots: fill rest
            out[bi, :, k:] = filled[:, :1]
    return torch.from_numpy(out)


def group_points(points, idx):
    """(B, C, N) x (B, M, S) -> (B, C, M, S)."""
    b, c, n = points.shape
    m, s = idx.shape[1], idx.shape[2]
    idx = idx.long().reshape(b, -1)
    out = torch.stack([points[i][:, idx[i]] for i in range(b)])
    return out.reshape(b, c, m, s).contiguous().clone()


def group_points_grad(grad_out, idx, n):
    """(B, C, M, S) x (B, M, S) -> (B, C, N) scatter-add
    (group_points_gpu.cu:66-68)."""
    b, c = grad_out.shape[0], grad_out.shape[1]
    flat = grad_out.reshape(b, c, -1)
    idx = idx.long().reshape(b, 1, -1).expand_as(flat)
    out = torch.zeros((b, c, n), dtype=grad_out.dtype)
    return out.scatter_add_(2, idx, flat)


def three_nn(unknown, known):
    """-> (dist2 (B,n,3), idx (B,n,3)) — squared distances like the CUDA
    kernel (the python wrapper takes the sqrt)."""
    u = unknown.detach().cpu().numpy().astype(np.float64)
    k = known.detach().cpu().numpy().astype(np.float64)
    b, n, _ = u.shape
    dist = np.zeros((b, n, 3))
    idx = np.zeros((b, n, 3), dtype=np.int32)
    for bi in range(b):
        d2 = np.sum((u[bi][:, None, :] - k[bi][None, :, :]) ** 2, -1)
        order = np.argsort(d2, axis=1, kind="stable")[:, :3]
        idx[bi] = order
        dist[bi] = np.take_along_axis(d2, order, axis=1)
    return (torch.from_numpy(dist).to(unknown.dtype),
            torch.from_numpy(idx))


def three_interpolate(points, idx, weight):
    """(B, C, M) x (B, n, 3) x (B, n, 3) -> (B, C, n)."""
    b, c, m = points.shape
    n = idx.shape[1]
    idx = idx.long()
    out = torch.zeros((b, c, n), dtype=points.dtype)
    for i in range(b):
        g = points[i][:, idx[i].reshape(-1)].reshape(c, n, 3)
        out[i] = (g * weight[i].unsqueeze(0)).sum(-1)
    return out


def three_interpolate_grad(grad_out, idx, weight, m):
    """(B, C, n) x (B, n, 3) x (B, n, 3) -> (B, C, m) weighted
    scatter-add (interpolate_gpu.cu:146-148)."""
    b, c, n = grad_out.shape
    weighted = grad_out.unsqueeze(-1) * weight.unsqueeze(1)  # (B,C,n,3)
    flat = weighted.reshape(b, c, -1)
    idx = idx.long().reshape(b, 1, -1).expand_as(flat)
    out = torch.zeros((b, c, m), dtype=grad_out.dtype)
    return out.scatter_add_(2, idx, flat)


def install():
    """Register this module as `pointnet2._ext` in sys.modules."""
    import sys
    import types

    ext = types.ModuleType("pointnet2._ext")
    for name in ("furthest_point_sampling", "gather_points",
                 "gather_points_grad", "ball_query", "group_points",
                 "group_points_grad", "three_nn", "three_interpolate",
                 "three_interpolate_grad"):
        setattr(ext, name, globals()[name])
    pkg = sys.modules.get("pointnet2")
    if pkg is None:
        pkg = types.ModuleType("pointnet2")
        pkg.__path__ = []
        sys.modules["pointnet2"] = pkg
    pkg._ext = ext
    sys.modules["pointnet2._ext"] = ext
    return ext
