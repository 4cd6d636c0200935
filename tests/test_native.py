"""Native C++ geometry library tests (skipped if no toolchain)."""

import numpy as np
import pytest

from backtoreality_tpu.eval import native
from backtoreality_tpu.eval.box3d import box3d_iou, get_3d_box_batch

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable")


def _random_boxes(rng, n):
    sizes = rng.random((n, 3)) + 0.5
    angles = rng.random(n) * 2 * np.pi
    centers = rng.random((n, 3)) * 4
    return get_3d_box_batch(sizes, angles, centers)


def test_matrix_matches_python():
    rng = np.random.default_rng(0)
    a = _random_boxes(rng, 12)
    b = _random_boxes(rng, 9)
    mat = native.box3d_iou_matrix(a, b)
    assert mat.shape == (12, 9)
    for i in range(12):
        for j in range(9):
            want = box3d_iou(a[i], b[j])[0]
            assert mat[i, j] == pytest.approx(want, abs=1e-6), (i, j)


def test_identical_boxes_iou_one():
    rng = np.random.default_rng(1)
    a = _random_boxes(rng, 5)
    mat = native.box3d_iou_matrix(a, a)
    np.testing.assert_allclose(np.diag(mat), 1.0, atol=1e-6)


def test_eval_det_same_result_with_native(monkeypatch):
    import importlib

    ed = importlib.import_module("backtoreality_tpu.eval.eval_det")

    rng = np.random.default_rng(2)
    gt_boxes = _random_boxes(rng, 6)
    pred_boxes = np.concatenate(
        [gt_boxes[:4], _random_boxes(rng, 5)])  # 4 hits + 5 misses
    scores = rng.random(len(pred_boxes))
    pred = {0: [("c", b, s) for b, s in zip(pred_boxes, scores)]}
    gt = {0: [("c", b) for b in gt_boxes]}

    _, _, ap_native = ed.eval_det(pred, gt, ovthresh=0.25)
    monkeypatch.setattr(native, "available", lambda: False)
    _, _, ap_python = ed.eval_det(pred, gt, ovthresh=0.25)
    assert ap_native["c"] == pytest.approx(ap_python["c"], abs=1e-9)
