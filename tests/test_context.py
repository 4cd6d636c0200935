"""Context-vector scarce-class selection tests.

Hand-traced against the reference algorithm
(`scannet_detection_dataset.py:261-315` co-occurrence + scoring,
`scannet_scene_synthesis.py:557-638` augmentation pass).
"""

import json

import numpy as np

from backtoreality_tpu.data import scannet_md40_config
from backtoreality_tpu.datagen import context
from backtoreality_tpu.datagen.cli import main as cli_main

from test_scannet_adapter import write_binary_ply

T2C = scannet_md40_config().type2class

SCENES = {
    "s0": {"bathtub", "bottle", "toilet"},
    "s1": {"bench", "cup", "chair"},
    "s2": {"bed", "sofa"},          # not gated (no bottle/cup/keyboard)
    "s3": {"bottle", "toilet"},
    "s4": {"laptop", "keyboard", "desk"},
}


def _labels():
    names = sorted(SCENES)
    return names, [context.cloud_label(SCENES[n], T2C) for n in names]


class TestSelection:
    def test_cooccurrence_hand_traced(self):
        _, labels = _labels()
        cs = context.cooccurrence_matrix(labels)
        # bathtub appears in s0 only; co-occurs once with bottle/toilet
        assert cs[T2C["bathtub"], T2C["bathtub"]] == 1
        assert cs[T2C["bathtub"], T2C["bottle"]] == 1
        assert cs[T2C["bathtub"], T2C["toilet"]] == 1
        assert cs[T2C["bathtub"], T2C["chair"]] == 0
        # bottle appears in s0 and s3; toilet in both -> 2
        assert cs[T2C["bottle"], T2C["toilet"]] == 2

    def test_context_vector_normalized_diag_zero(self):
        _, labels = _labels()
        cs = context.cooccurrence_matrix(labels)
        vec = context.context_vector(cs, T2C["bottle"])
        assert vec[T2C["bottle"]] == 0.0
        # toilet co-occurs with bottle in 2 of bottle's 2 scenes
        assert vec[T2C["toilet"]] == 1.0
        assert vec[T2C["bathtub"]] == 0.5

    def test_gate_mask(self):
        _, labels = _labels()
        gate = context.gated(labels, T2C)
        # s2 is the only scene with no bottle/cup/keyboard
        np.testing.assert_array_equal(gate, [True, True, False, True,
                                             True])

    def test_scores_hand_traced(self):
        """bathtub scores: s0 = 2 - 0.3*3 = 1.1, s3 = 2 - 0.6 = 1.4,
        s1 = s4 = -0.9; top-1 -> s3, top-2 -> {s3, s0}."""
        names, labels = _labels()
        sel1 = context.select_scarce_scenes(
            names, labels, T2C, top_counts={"bathtub": 1})
        assert sel1 == {"bathtub": {"s3"}}
        sel2 = context.select_scarce_scenes(
            names, labels, T2C, top_counts={"bathtub": 2})
        assert sel2["bathtub"] == {"s3", "s0"}

    def test_ungated_scene_never_selected(self):
        names, labels = _labels()
        sel = context.select_scarce_scenes(names, labels, T2C)
        for scans in sel.values():
            assert "s2" not in scans

    def test_absent_class_zero_vector(self):
        _, labels = _labels()
        cs = context.cooccurrence_matrix(labels)
        vec = context.context_vector(cs, T2C["wardrobe"])
        assert (vec == 0).all()


def _write_scan(root, scan, blobs):
    """ScanNet-format scan dir with a floor plane + labelled blobs."""
    d = root / scan
    d.mkdir()
    rng = np.random.default_rng(hash(scan) % 2**31)
    floor = np.zeros((500, 6))
    floor[:, 0:2] = rng.random((500, 2)) * 4
    parts, seg_indices, groups = [floor], [0] * 500, [
        {"objectId": 0, "label": "floor", "segments": [0]}]
    for i, (label, offset) in enumerate(blobs, start=1):
        blob = np.zeros((200, 6))
        blob[:, 0:3] = rng.random((200, 3)) * 0.5 + offset
        parts.append(blob)
        seg_indices += [i] * 200
        groups.append({"objectId": i, "label": label, "segments": [i]})
    write_binary_ply(d / f"{scan}_vh_clean_2.ply",
                     np.concatenate(parts))
    (d / f"{scan}_vh_clean_2.0.010000.segs.json").write_text(
        json.dumps({"segIndices": seg_indices}))
    (d / f"{scan}.aggregation.json").write_text(
        json.dumps({"segGroups": groups}))
    (d / f"{scan}.txt").write_text(
        "axisAlignment = 1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1\n")


class TestExportRealCLI:
    """End-to-end `export-real` on ScanNet-file-spec scans: the npy
    quadruple contract (`load_scannet_data.py:26-209` output format)."""

    def test_quadruple_contract(self, tmp_path):
        scans = tmp_path / "scans"
        scans.mkdir()
        _write_scan(scans, "scene0002_00",
                    [("chair", [1.0, 1.0, 0.0]),
                     ("table", [2.5, 2.5, 0.0])])
        out = tmp_path / "real"
        cli_main(["export-real", "--scans_dir", str(scans),
                  "--out", str(out), "--max_points", "600"])
        verts = np.load(out / "scene0002_00_vert.npy")
        sem = np.load(out / "scene0002_00_sem_label.npy")
        ins = np.load(out / "scene0002_00_ins_label.npy")
        bbox = np.load(out / "scene0002_00_bbox.npy")
        # max_points is a cap (reference downsamples only above it,
        # `batch_load_scannet_data.py:23`): 900 raw -> 600
        assert verts.shape == (600, 6) and verts.dtype == np.float32
        assert sem.shape == (600,) and ins.shape == (600,)
        # chair=modelnet id 9, table=34 (map2modelnet)
        assert sorted(bbox[:, -1].astype(int)) == [9, 34]
        assert bbox.shape[1] == 7  # cx,cy,cz,dx,dy,dz,cls (axis-aligned)
        # instance ids in ins_label cover the exported boxes
        assert {1, 2} <= set(np.unique(ins).astype(int))
        # and the export is consumable by the detection dataset
        from backtoreality_tpu.data import scannet_md40_config
        from backtoreality_tpu.data.dataset import DetectionDataset

        ds = DetectionDataset(scannet_md40_config(), out, split="all",
                              num_points=800)
        item = ds.get(0)
        assert item["point_clouds"].shape == (800, 3)
        assert int(item["box_label_mask"].sum()) == 2


class TestSynthesizeAug:
    def test_gated_scene_gets_aug_copies(self, tmp_path):
        scans = tmp_path / "scans"
        scans.mkdir()
        # scene0000_00: keyboard -> gated; scene0001_00: chair only
        _write_scan(scans, "scene0000_00",
                    [("keyboard", [1.0, 1.0, 0.0]),
                     ("chair", [2.5, 2.5, 0.0])])
        _write_scan(scans, "scene0001_00",
                    [("chair", [1.5, 1.5, 0.0])])
        out = tmp_path / "out"
        cli_main(["synthesize", "--scans_dir", str(scans),
                  "--out", str(out), "--procedural",
                  "--num_aug", "2", "--seed", "0"])
        produced = {p.name for p in out.glob("*_vert.npy")}
        assert "scene0000_00_vert.npy" in produced
        assert "scene0001_00_vert.npy" in produced
        # only the gated scene gets augmented copies, named like the
        # reference: scene_aug{k}_0000_00
        aug = sorted(n for n in produced if "_aug" in n)
        assert aug == ["scene_aug0_0000_00_vert.npy",
                       "scene_aug1_0000_00_vert.npy"]
        # augmented copy inserts scarce classes / duplicates gated ones
        base = np.load(out / "scene0000_00_bbox.npy")
        augbox = np.load(out / "scene_aug0_0000_00_bbox.npy")
        assert len(augbox) > len(base)
