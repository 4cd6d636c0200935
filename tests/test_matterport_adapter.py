"""Matterport raw-format adapter tests on a synthetic mini-house."""

import json

import numpy as np
import pytest

from backtoreality_tpu.datagen.matterport_adapter import (
    compute_class_mean_sizes,
    export_region,
    export_weak_objects,
    organize_regions,
    read_category_mapping,
)
from test_scannet_adapter import write_binary_ply


@pytest.fixture(scope="module")
def mini_house(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp")
    region_dir = root / "house0" / "region_segmentations"
    region_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)

    floor = np.zeros((400, 6))
    floor[:, 0:2] = rng.random((400, 2)) * 5
    # a rotated "bed" (modelnet id 3)
    bed = np.zeros((400, 6))
    pts = (rng.random((400, 3)) - 0.5) * [2.0, 1.4, 0.6]
    c, s = np.cos(0.6), np.sin(0.6)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    bed[:, 0:3] = pts @ rot.T + [2.0, 2.0, 0.5]
    verts = np.concatenate([floor, bed])
    write_binary_ply(region_dir / "region0.ply", verts)
    segs = [0] * 400 + [1] * 400
    (region_dir / "region0.vsegs.json").write_text(
        json.dumps({"segIndices": segs}))
    (region_dir / "region0.semseg.json").write_text(json.dumps({
        "segGroups": [
            {"objectId": 0, "label": "floor", "segments": [0]},
            {"objectId": 1, "label": "bed", "segments": [1]},
        ]
    }))
    return root


def test_category_mapping():
    mapping = read_category_mapping()
    assert mapping.get("bed") == 3
    assert mapping.get("chair") == 9


def test_organize_and_export(mini_house, tmp_path):
    names = organize_regions(mini_house, tmp_path / "scans")
    assert names == ["scene0000_00"]
    verts, sem, ins, bboxes = export_region(
        tmp_path / "scans" / "scene0000_00", max_points=None)
    assert bboxes.shape == (1, 8)  # rotated box with angle column
    cx, cy, cz, sx, sy, dz, angle, lid = bboxes[0]
    assert int(lid) == 3
    np.testing.assert_allclose([cx, cy], [2.0, 2.0], atol=0.1)
    # MER recovers the true footprint (2.0 x 1.4) up to sampling noise
    assert sorted([sx, sy], reverse=True) == pytest.approx(
        [2.0, 1.4], abs=0.15)
    assert dz == pytest.approx(0.6, abs=0.1)


def test_weak_objects(mini_house, tmp_path):
    organize_regions(mini_house, tmp_path / "scans")
    objects, floor_pts, _ = export_weak_objects(
        tmp_path / "scans" / "scene0000_00")
    assert len(objects) == 1
    assert objects[0].class_name == "bed"
    assert len(floor_pts) > 100


def test_mean_sizes(mini_house, tmp_path):
    organize_regions(mini_house, tmp_path / "scans")
    verts, sem, ins, bboxes = export_region(
        tmp_path / "scans" / "scene0000_00", max_points=None)
    out = tmp_path / "data"
    out.mkdir()
    np.save(out / "scene0000_00_bbox.npy", bboxes)
    means = compute_class_mean_sizes(out)
    assert means.shape == (13, 3)
    assert means[1].sum() > 0  # bed is class index 1 in MD40_IDS_MP
