"""Numpy oracles emulating the reference CUDA kernels' algorithms.

These re-state the semantics of
`detection/Votenet/pointnet2/_ext_src/src/*.cu` as straightforward
Python loops; the JAX/Pallas ops are validated against them exactly.
"""

import numpy as np


def fps_oracle(xyz: np.ndarray, npoint: int) -> np.ndarray:
    """sampling_gpu.cu:74-177 — sequential FPS with the padding skip."""
    b, n, _ = xyz.shape
    out = np.zeros((b, npoint), dtype=np.int32)
    for bi in range(b):
        pts = xyz[bi]
        mag = np.sum(pts * pts, axis=1)
        valid = mag > 1e-3
        temp = np.full(n, 1e10, dtype=np.float64)
        old = 0
        for j in range(1, npoint):
            best, besti = -1.0, 0
            ref = pts[old]
            d = np.sum((pts - ref) ** 2, axis=1)
            temp = np.minimum(temp, d)
            cand = np.where(valid, temp, -1.0)
            besti = int(np.argmax(cand))
            out[bi, j] = besti
            old = besti
    return out


def ball_query_oracle(xyz, new_xyz, radius, nsample):
    """ball_query_gpu.cu:14-59 — first-k in index order with slot-fill."""
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    out = np.zeros((b, m, nsample), dtype=np.int32)
    r2 = radius * radius
    for bi in range(b):
        for j in range(m):
            cnt = 0
            for k in range(n):
                d2 = np.sum((new_xyz[bi, j] - xyz[bi, k]) ** 2)
                if d2 < r2:
                    if cnt == 0:
                        out[bi, j, :] = k
                    out[bi, j, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return out


def ball_query_stratified_oracle(xyz, new_xyz, radius, nsample):
    """Bucketed variant: slot s takes the first hit in contiguous bucket s;
    empty slots take the globally first hit; no hit at all -> 0. The
    bucket width is lane-aligned (part of the op's semantics)."""
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    bucket = max(-(-(-(-n // nsample)) // 128) * 128, 128)
    out = np.zeros((b, m, nsample), dtype=np.int32)
    r2 = radius * radius
    for bi in range(b):
        d2 = np.sum(
            (new_xyz[bi][:, None, :] - xyz[bi][None, :, :]) ** 2, axis=-1
        )  # (m, n)
        for j in range(m):
            hits = d2[j] < r2
            slots = np.zeros(nsample, dtype=np.int32)
            has = np.zeros(nsample, dtype=bool)
            for s in range(nsample):
                lo, hi = s * bucket, min((s + 1) * bucket, n)
                idxs = np.nonzero(hits[lo:hi])[0]
                if len(idxs):
                    slots[s] = lo + idxs[0]
                    has[s] = True
            if has.any():
                fill = slots[np.nonzero(has)[0][0]]
            else:
                fill = 0
            out[bi, j] = np.where(has, slots, fill)
    return out


def three_nn_oracle(unknown, known):
    """interpolate_gpu.cu:13-75 — brute-force 3-NN, sqrt distances."""
    b, n, _ = unknown.shape
    dist = np.zeros((b, n, 3), dtype=np.float64)
    idx = np.zeros((b, n, 3), dtype=np.int32)
    for bi in range(b):
        d2 = np.sum(
            (unknown[bi][:, None, :] - known[bi][None, :, :]) ** 2, axis=-1
        )
        order = np.argsort(d2, axis=1, kind="stable")[:, :3]
        idx[bi] = order
        dist[bi] = np.sqrt(np.take_along_axis(d2, order, axis=1))
    return dist, idx


def nn_distance_oracle(pc1, pc2):
    """utils/nn_distance.py:63-94 double-loop golden reference (L2^2)."""
    b, n, _ = pc1.shape
    m = pc2.shape[1]
    dist1 = np.zeros((b, n))
    idx1 = np.zeros((b, n), dtype=np.int32)
    dist2 = np.zeros((b, m))
    idx2 = np.zeros((b, m), dtype=np.int32)
    for bi in range(b):
        d = np.sum(
            (pc1[bi][:, None, :] - pc2[bi][None, :, :]) ** 2, axis=-1
        )
        dist1[bi] = d.min(axis=1)
        idx1[bi] = d.argmin(axis=1)
        dist2[bi] = d.min(axis=0)
        idx2[bi] = d.argmin(axis=0)
    return dist1, idx1, dist2, idx2
