"""Eval stack tests: box IoU geometry, NMS, VOC AP, APCalculator."""

import numpy as np
import pytest

from backtoreality_tpu.data import scannet_md40_config, matterport_md40_config
from backtoreality_tpu.eval import (
    APCalculator,
    box3d_iou,
    get_3d_box,
    get_3d_box_batch,
    nms_3d_faster,
    nms_3d_faster_samecls,
    parse_groundtruths,
    parse_predictions,
    voc_ap,
)


class TestBoxGeometry:
    def test_corners_axis_aligned(self):
        c = get_3d_box((2.0, 4.0, 6.0), 0.0, (0.0, 0.0, 0.0))
        assert c.shape == (8, 3)
        np.testing.assert_allclose(sorted(set(np.round(c[:, 0], 6))),
                                   [-1, 1])
        np.testing.assert_allclose(sorted(set(np.round(c[:, 1], 6))),
                                   [-3, 3])
        np.testing.assert_allclose(sorted(set(np.round(c[:, 2], 6))),
                                   [-2, 2])
        # top face is rows 0-3, bottom rows 4-7 (y = camera up)
        assert (c[:4, 1] == 3).all() and (c[4:, 1] == -3).all()

    def test_batch_matches_single(self):
        rng = np.random.default_rng(0)
        sizes = rng.random((5, 3)) + 0.5
        angles = rng.random(5) * 2 * np.pi
        centers = rng.random((5, 3)) * 4
        batch = get_3d_box_batch(sizes, angles, centers)
        for i in range(5):
            single = get_3d_box(sizes[i], angles[i], centers[i])
            np.testing.assert_allclose(batch[i], single, atol=1e-12)

    def test_iou_identical(self):
        c = get_3d_box((1.0, 1.0, 1.0), 0.3, (1.0, 2.0, 3.0))
        iou3d, iou2d = box3d_iou(c, c)
        assert iou3d == pytest.approx(1.0, rel=1e-6)
        assert iou2d == pytest.approx(1.0, rel=1e-6)

    def test_iou_disjoint(self):
        a = get_3d_box((1.0, 1.0, 1.0), 0.0, (0.0, 0.0, 0.0))
        b = get_3d_box((1.0, 1.0, 1.0), 0.0, (5.0, 0.0, 0.0))
        assert box3d_iou(a, b)[0] == 0.0

    def test_iou_half_overlap(self):
        # unit cubes offset by 0.5 in x: inter 0.5, union 1.5
        a = get_3d_box((1.0, 1.0, 1.0), 0.0, (0.0, 0.0, 0.0))
        b = get_3d_box((1.0, 1.0, 1.0), 0.0, (0.5, 0.0, 0.0))
        assert box3d_iou(a, b)[0] == pytest.approx(1 / 3, rel=1e-5)

    def test_iou_rotated_45(self):
        # square rotated 45 deg inside same-size square:
        # intersection is a regular octagon with area 2*(sqrt2 - 1)
        a = get_3d_box((1.0, 1.0, 1.0), 0.0, (0.0, 0.0, 0.0))
        b = get_3d_box((1.0, 1.0, 1.0), np.pi / 4, (0.0, 0.0, 0.0))
        inter = 2 * (np.sqrt(2) - 1)
        want = inter / (2 - inter)
        assert box3d_iou(a, b)[0] == pytest.approx(want, rel=1e-5)


class TestNMS:
    def test_3d_suppression(self):
        # box 1 overlaps box 0 heavily with lower score; box 2 disjoint
        boxes = np.array([
            [0, 0, 0, 1, 1, 1, 0.9],
            [0.05, 0, 0, 1.05, 1, 1, 0.5],
            [5, 5, 5, 6, 6, 6, 0.7],
        ])
        pick = nms_3d_faster(boxes, 0.25)
        assert sorted(pick) == [0, 2]

    def test_samecls_keeps_other_class(self):
        boxes = np.array([
            [0, 0, 0, 1, 1, 1, 0.9, 1],
            [0.05, 0, 0, 1.05, 1, 1, 0.5, 2],  # other class survives
            [0.05, 0, 0, 1.05, 1, 1, 0.4, 1],  # same class suppressed
        ])
        pick = nms_3d_faster_samecls(boxes, 0.25)
        assert sorted(pick) == [0, 1]


class TestVocAP:
    def test_perfect(self):
        rec = np.array([0.5, 1.0])
        prec = np.array([1.0, 1.0])
        assert voc_ap(rec, prec) == pytest.approx(1.0)

    def test_half(self):
        # one TP then one FP over 2 GT: rec [0.5,0.5], prec [1,0.5]
        rec = np.array([0.5, 0.5])
        prec = np.array([1.0, 0.5])
        assert voc_ap(rec, prec) == pytest.approx(0.5)


def _perfect_end_points(cfg, b=2, k=4):
    """Model outputs whose argmax decodes exactly to the GT boxes."""
    rng = np.random.default_rng(1)
    centers = rng.random((b, k, 3)).astype(np.float32) * 6
    size_cls = rng.integers(0, cfg.num_size_cluster, (b, k))
    sem_cls = size_cls.copy()
    heading_cls = rng.integers(0, cfg.num_heading_bin, (b, k))
    heading_res = (rng.random((b, k)) - 0.5) * (
        np.pi / cfg.num_heading_bin) * 0.5
    size_res = (rng.random((b, k, 3)).astype(np.float32) - 0.5) * 0.1

    def onehot_scores(cls, num):
        return np.eye(num)[cls] * 10.0

    heading_residuals = np.zeros((b, k, cfg.num_heading_bin),
                                 np.float32)
    np.put_along_axis(heading_residuals, heading_cls[..., None],
                      heading_res[..., None], axis=2)
    size_residuals = np.zeros((b, k, cfg.num_size_cluster, 3), np.float32)
    np.put_along_axis(size_residuals, size_cls[..., None, None],
                      size_res[:, :, None, :], axis=2)

    ep = {
        "center": centers,
        "objectness_scores": np.stack(
            [np.full((b, k), -5.0), np.full((b, k), 5.0)], axis=-1),
        "heading_scores": onehot_scores(heading_cls, cfg.num_heading_bin),
        "heading_residuals": heading_residuals,
        "size_scores": onehot_scores(size_cls, cfg.num_size_cluster),
        "size_residuals": size_residuals,
        "sem_cls_scores": onehot_scores(sem_cls, cfg.num_class),
        # labels (identical)
        "center_label": centers,
        "heading_class_label": heading_cls,
        "heading_residual_label": heading_res,
        "size_class_label": size_cls,
        "size_residual_label": size_res,
        "sem_cls_label": sem_cls,
        "box_label_mask": np.ones((b, k), np.float32),
    }
    return ep


@pytest.mark.parametrize("cfg_fn", [scannet_md40_config,
                                    matterport_md40_config])
def test_perfect_predictions_give_map_1(cfg_fn):
    cfg = cfg_fn()
    ep = _perfect_end_points(cfg)
    config_dict = {
        "dataset_config": cfg, "remove_empty_box": False,
        "use_3d_nms": True, "nms_iou": 0.25, "use_old_type_nms": False,
        "cls_nms": True, "per_class_proposal": True, "conf_thresh": 0.05,
    }
    preds = parse_predictions(ep, config_dict)
    gts = parse_groundtruths(ep, config_dict)
    calc = APCalculator(0.25, cfg.class2type)
    calc.step(preds, gts)
    metrics = calc.compute_metrics()
    assert metrics["mAP"] == pytest.approx(1.0)
    assert metrics["AR"] == pytest.approx(1.0)


def test_missed_detection_lowers_map():
    cfg = scannet_md40_config()
    ep = _perfect_end_points(cfg, b=1, k=4)
    # push one proposal's objectness below the confidence threshold
    ep["objectness_scores"] = ep["objectness_scores"].copy()
    ep["objectness_scores"][0, 0] = [5.0, -5.0]
    config_dict = {
        "dataset_config": cfg, "remove_empty_box": False,
        "use_3d_nms": True, "nms_iou": 0.25, "use_old_type_nms": False,
        "cls_nms": True, "per_class_proposal": True, "conf_thresh": 0.05,
    }
    preds = parse_predictions(ep, config_dict)
    gts = parse_groundtruths(ep, config_dict)
    calc = APCalculator(0.25, cfg.class2type)
    calc.step(preds, gts)
    metrics = calc.compute_metrics()
    assert metrics["mAP"] < 1.0
