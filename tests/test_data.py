"""Data pipeline tests: synthetic scans -> dataset labels -> loader."""

import numpy as np
import pytest

from backtoreality_tpu.data import matterport_md40_config, scannet_md40_config
from backtoreality_tpu.data.dataset import DetectionDataset
from backtoreality_tpu.data.loader import DetectionDataLoader, cycle
from backtoreality_tpu.data.synthetic import write_synthetic_scans

NUM_POINTS = 4000


@pytest.fixture(scope="module")
def scannet_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scannet_synth")
    write_synthetic_scans(d, scannet_md40_config(), num_scans=3,
                          num_objects=5)
    return d


@pytest.fixture(scope="module")
def matterport_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("matterport_synth")
    write_synthetic_scans(d, matterport_md40_config(), num_scans=2,
                          num_objects=5)
    return d


class TestDataset:
    def test_item_contract(self, scannet_dir):
        cfg = scannet_md40_config()
        ds = DetectionDataset(cfg, scannet_dir, split="all",
                              num_points=NUM_POINTS, augment=True,
                              use_height=True)
        assert len(ds) == 3
        item = ds.get(0, epoch=0)
        assert item["point_clouds"].shape == (NUM_POINTS, 4)  # xyz+height
        k = cfg.max_num_obj
        assert item["center_label"].shape == (k, 3)
        assert item["vote_label"].shape == (NUM_POINTS, 9)
        assert item["vote_label_mask"].shape == (NUM_POINTS,)
        assert item["box_label_mask"].sum() == 5
        assert item["cloud_label"].shape == (cfg.num_class,)
        # votes: three tiled copies identical
        np.testing.assert_array_equal(item["vote_label"][:, 0:3],
                                      item["vote_label"][:, 3:6])

    def test_votes_point_to_instance_center(self, scannet_dir):
        cfg = scannet_md40_config()
        ds = DetectionDataset(cfg, scannet_dir, split="all",
                              num_points=NUM_POINTS, augment=False)
        item = ds.get(1, epoch=0)
        pc = item["point_clouds"][:, :3]
        mask = item["vote_label_mask"].astype(bool)
        votes = pc[mask] + item["vote_label"][mask, 0:3]
        # every vote target must coincide with some GT center (no
        # augmentation, synthetic boxes = instance extents)
        centers = item["center_label"][item["box_label_mask"] > 0]
        d = np.linalg.norm(votes[:, None] - centers[None], axis=-1)
        assert d.min(axis=1).max() < 0.15

    def test_determinism(self, scannet_dir):
        cfg = scannet_md40_config()
        ds = DetectionDataset(cfg, scannet_dir, split="all",
                              num_points=NUM_POINTS, augment=True,
                              seed=5)
        a = ds.get(0, epoch=3)
        b = ds.get(0, epoch=3)
        np.testing.assert_array_equal(a["point_clouds"],
                                      b["point_clouds"])
        c = ds.get(0, epoch=4)
        assert not np.array_equal(a["point_clouds"], c["point_clouds"])

    def test_center_jitter_virtual_vs_real(self, scannet_dir, tmp_path):
        cfg = scannet_md40_config()
        # 'obj' in path -> virtual protocol (fresh jitter)
        objdir = tmp_path / "synth_obj_aug"
        write_synthetic_scans(objdir, cfg, num_scans=2, num_objects=4)
        ds = DetectionDataset(cfg, objdir, split="all",
                              num_points=NUM_POINTS, center_jitter=0.1)
        item = ds.get(0, epoch=0)
        mask = item["box_label_mask"] > 0
        assert np.abs(item["center_jitter"][mask]).max() > 0
        # jitter scales with box size
        assert (np.abs(item["center_jitter"][mask])
                <= 0.05 * item["size_gts"][mask] + 1e-9).all()

    def test_matterport_headings(self, matterport_dir):
        cfg = matterport_md40_config()
        ds = DetectionDataset(cfg, matterport_dir, split="all",
                              num_points=NUM_POINTS, augment=True)
        item = ds.get(0, epoch=1)
        mask = item["box_label_mask"] > 0
        assert item["heading_class_label"][mask].max() > 0  # uses bins
        per = 2 * np.pi / cfg.num_heading_bin
        assert np.abs(item["heading_residual_label"]).max() <= per / 2 + 1e-6


class TestLoader:
    def test_batching_and_epoch_shuffle(self, scannet_dir):
        cfg = scannet_md40_config()
        ds = DetectionDataset(cfg, scannet_dir, split="all",
                              num_points=NUM_POINTS)
        loader = DetectionDataLoader(ds, batch_size=2, drop_last=True,
                                     prefetch=0)
        batches = list(loader)
        assert len(batches) == 1
        assert batches[0]["point_clouds"].shape == (2, NUM_POINTS, 3)
        assert batches[0]["center_label"].dtype == np.float32

    def test_sharding_partitions(self, scannet_dir):
        cfg = scannet_md40_config()
        ds = DetectionDataset(cfg, scannet_dir, split="all",
                              num_points=NUM_POINTS)
        seen = []
        for shard in range(3):
            loader = DetectionDataLoader(
                ds, batch_size=1, shuffle=False, num_shards=3,
                shard_index=shard, prefetch=0)
            for b in loader:
                seen.append(int(b["scan_idx"][0]))
        assert sorted(seen) == [0, 1, 2]

    def test_cycle(self, scannet_dir):
        cfg = scannet_md40_config()
        ds = DetectionDataset(cfg, scannet_dir, split="all",
                              num_points=NUM_POINTS)
        loader = DetectionDataLoader(ds, batch_size=2, prefetch=0)
        it = cycle(loader)
        for _ in range(3):  # longer than one epoch (1 batch)
            batch = next(it)
            assert batch["point_clouds"].shape[0] == 2


class TestRamCacheBudget:
    def test_budget_caps_cache(self, scannet_dir):
        cfg = scannet_md40_config()
        ds = DetectionDataset(cfg, scannet_dir, split="all",
                              num_points=NUM_POINTS,
                              ram_cache_bytes=1)  # nothing fits
        ds.get(0)
        ds.get(1)
        assert len(ds._cache) == 0
        ds2 = DetectionDataset(cfg, scannet_dir, split="all",
                               num_points=NUM_POINTS)  # default 8 GB
        ds2.get(0)
        ds2.get(1)
        assert len(ds2._cache) == 2
        assert ds2._cache_bytes > 0

    def test_cache_off(self, scannet_dir):
        ds = DetectionDataset(scannet_md40_config(), scannet_dir,
                              split="all", num_points=NUM_POINTS,
                              ram_cache=False)
        ds.get(0)
        assert ds._cache is None


class TestShapeLibraryScenes:
    def test_generate_scene_with_library(self):
        from backtoreality_tpu.data.synthetic import generate_scene
        from backtoreality_tpu.datagen.library import (
            rich_procedural_library,
        )

        cfg = scannet_md40_config()
        lib = rich_procedural_library(num_families=4)
        rng = np.random.default_rng(0)
        verts, ins, sem, bbox = generate_scene(
            cfg, rng, num_objects=5, shape_library=lib)
        assert len(bbox) == 5
        # every labeled object's points stay inside its (axis-aligned)
        # box, modulo float slack
        for i in range(5):
            pts = verts[ins == i + 1, :3]
            c, d = bbox[i, :3], bbox[i, 3:6]
            assert (np.abs(pts - c) <= d / 2 + 1e-6).all()
