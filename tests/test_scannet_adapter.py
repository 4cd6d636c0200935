"""ScanNet raw-format adapter tests on a synthetic mini-scan."""

import json

import numpy as np
import pytest

from backtoreality_tpu.datagen.scannet_adapter import (
    export_scan,
    export_weak_objects,
    read_aggregation,
    read_ply_vertices_rgb,
    read_segmentation,
)


def write_binary_ply(path, verts):
    """ScanNet-style binary PLY: xyz float + rgb uchar (+alpha)."""
    n = len(verts)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "property uchar alpha\n"
        "end_header\n"
    )
    rec = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                             ("r", "u1"), ("g", "u1"), ("b", "u1"),
                             ("a", "u1")])
    rec["x"], rec["y"], rec["z"] = verts[:, 0], verts[:, 1], verts[:, 2]
    rec["r"], rec["g"], rec["b"] = (verts[:, 3:6].astype(np.uint8).T
                                    if verts.shape[1] > 3
                                    else (0, 0, 0))
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(rec.tobytes())


@pytest.fixture(scope="module")
def mini_scan(tmp_path_factory):
    """A floor plane + a 'chair' blob + a 'table' blob in ScanNet files."""
    root = tmp_path_factory.mktemp("scans")
    scan = "scene0000_00"
    d = root / scan
    d.mkdir()
    rng = np.random.default_rng(0)

    floor = np.zeros((500, 6))
    floor[:, 0:2] = rng.random((500, 2)) * 4
    chair = np.zeros((300, 6))
    chair[:, 0:3] = rng.random((300, 3)) * 0.6 + [1.0, 1.0, 0.0]
    chair[:, 3:6] = 128
    table = np.zeros((300, 6))
    table[:, 0:3] = rng.random((300, 3)) * [1.2, 0.8, 0.7] + [2.5, 2.5, 0]
    verts = np.concatenate([floor, chair, table])
    write_binary_ply(d / f"{scan}_vh_clean_2.ply", verts)

    # segments: floor=seg0, chair=seg1, table=seg2
    seg_indices = [0] * 500 + [1] * 300 + [2] * 300
    (d / f"{scan}_vh_clean_2.0.010000.segs.json").write_text(
        json.dumps({"segIndices": seg_indices}))
    agg = {
        "segGroups": [
            {"objectId": 0, "label": "floor", "segments": [0]},
            {"objectId": 1, "label": "chair", "segments": [1]},
            {"objectId": 2, "label": "table", "segments": [2]},
        ]
    }
    (d / f"{scan}.aggregation.json").write_text(json.dumps(agg))
    (d / f"{scan}.txt").write_text(
        "axisAlignment = 1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1\n")
    return d


class TestAdapter:
    def test_ply_roundtrip(self, mini_scan):
        verts = read_ply_vertices_rgb(
            mini_scan / "scene0000_00_vh_clean_2.ply")
        assert verts.shape == (1100, 6)
        assert verts[500:800, 3].mean() == pytest.approx(128, abs=1)

    def test_json_readers(self, mini_scan):
        obj2segs, label2segs = read_aggregation(
            mini_scan / "scene0000_00.aggregation.json")
        assert obj2segs == {1: [0], 2: [1], 3: [2]}
        assert "chair" in label2segs
        seg2verts, n = read_segmentation(
            mini_scan / "scene0000_00_vh_clean_2.0.010000.segs.json")
        assert n == 1100
        assert len(seg2verts[1]) == 300

    def test_export_scan(self, mini_scan):
        verts, sem, ins, bboxes = export_scan(mini_scan,
                                              max_points=None)
        # chair (modelnet id 9) and table (34) boxes
        assert sorted(bboxes[:, -1].astype(int)) == [9, 34]
        chair_box = bboxes[bboxes[:, -1] == 9][0]
        np.testing.assert_allclose(chair_box[3:6], [0.6, 0.6, 0.6],
                                   atol=0.05)
        assert (sem[500:800] == 9).all()
        assert (ins[500:800] == 2).all()  # objectId 1 -> instance 2

    def test_export_weak_objects(self, mini_scan):
        objects, floor_pts, _ = export_weak_objects(mini_scan)
        names = sorted(o.class_name for o in objects)
        assert names == ["chair", "table"]
        chair = [o for o in objects if o.class_name == "chair"][0]
        # unknown scan -> no jitter: center = AABB center
        np.testing.assert_allclose(chair.center, [1.3, 1.3, 0.3],
                                   atol=0.05)
        assert len(floor_pts) >= 500
