"""Virtual-scene synthesis tests."""

import numpy as np
import pytest

from backtoreality_tpu.data import scannet_md40_config
from backtoreality_tpu.data.dataset import DetectionDataset
from backtoreality_tpu.datagen import (
    SceneObject,
    collision_aware_positions,
    generate_initial_positions,
    gravity_aware_positions,
    min_area_rect,
    procedural_library,
    synthesize_scene,
)
from backtoreality_tpu.datagen.library import MDN_DICT
from backtoreality_tpu.datagen.shapes import (
    analyze_shape,
    mer_canonical,
    support_height,
)
from backtoreality_tpu.datagen.synthesis import (
    export_scene,
    hidden_point_removal,
    place_points,
    write_scene,
)

CLASSES = ["table", "chair", "lamp", "monitor", "door"]
AVG_DIMS = {
    "table": (1.2, 0.8, 0.7, 0.8, 1.2, 0.7),
    "chair": (0.6, 0.6, 0.9, 0.6, 0.6, 0.9),
    "lamp": (0.3, 0.3, 0.5, 0.3, 0.3, 0.5),
    "monitor": (0.5, 0.2, 0.4, 0.2, 0.5, 0.4),
    "door": (1.0, 0.1, 2.0, 0.1, 1.0, 2.0),
}


@pytest.fixture(scope="module")
def library():
    return procedural_library(CLASSES,
                              rng=np.random.default_rng(0))


@pytest.fixture(scope="module")
def floor():
    rng = np.random.default_rng(1)
    pts = np.zeros((2000, 3))
    pts[:, 0] = rng.random(2000) * 8 - 4
    pts[:, 1] = rng.random(2000) * 8 - 4
    return pts


def _objects(rng, n=6):
    objs = []
    for i in range(n):
        cls = CLASSES[i % len(CLASSES)]
        center = np.array([rng.random() * 6 - 3, rng.random() * 6 - 3,
                           0.5])
        objs.append(SceneObject(oid=i + 1, class_name=cls,
                                center=center))
    return objs


class TestShapes:
    def test_min_area_rect_square(self):
        rng = np.random.default_rng(2)
        pts = rng.random((500, 2)) * [2.0, 1.0]
        (cx, cy), (w, h), _ = min_area_rect(pts)
        assert max(w, h) == pytest.approx(2.0, abs=0.1)
        assert min(w, h) == pytest.approx(1.0, abs=0.1)

    def test_mer_canonical_orders_long_short(self):
        mer = mer_canonical(((0, 0), (1.0, 3.0), 10.0))
        assert mer[1][0] >= mer[1][1]

    def test_table_is_supportable(self, library):
        recs = library.shapes["table"]
        assert any(r.supportable for r in recs)
        rec = recs[0]
        # support surface near the top of the shape
        assert rec.support_z > rec.points[:, 2].min()

    def test_analyze_box(self):
        rng = np.random.default_rng(3)
        pts = rng.random((2000, 3)) * [1.0, 2.0, 0.5]
        rec = analyze_shape("box", pts)
        assert rec.ls_ratio == pytest.approx(2.0, rel=0.15)
        assert rec.support_z == pytest.approx(0.5, abs=0.08)


class TestPlacement:
    def test_initial_positions(self, library):
        rng = np.random.default_rng(4)
        objs = _objects(rng)
        placements = generate_initial_positions(objs, library,
                                                AVG_DIMS, rng)
        assert set(placements) == {o.oid for o in objs}
        for oid, pl in placements.items():
            assert pl.scale[0] > 0
            if pl.obj.class_name == "table":
                assert pl.is_supporter
                assert pl.support_mer is not None
            # door scale constrained by height only
            if pl.obj.class_name == "door":
                dz = pl.shape.extents[2] * pl.scale[2]
                assert 0.8 * 2.0 * 0.99 <= dz <= 1.3 * 2.0 * 1.01

    def test_gravity_grounds_objects(self, library, floor):
        rng = np.random.default_rng(5)
        objs = _objects(rng)
        placements = generate_initial_positions(objs, library,
                                                AVG_DIMS, rng)
        placements, stage_map = gravity_aware_positions(placements,
                                                        floor)
        for oid, pl in placements.items():
            pts = place_points(pl, stride=7)
            supported = any(oid in kids for kids in stage_map.values())
            if pl.obj.class_name in ("table", "chair", "door") \
                    and not supported:
                assert pts[:, 2].min() == pytest.approx(0.0, abs=0.05)

    def test_collision_separates(self, library, floor):
        rng = np.random.default_rng(6)
        # two chairs at the same spot must get pushed apart
        objs = [
            SceneObject(1, "chair", np.array([0.0, 0.0, 0.5])),
            SceneObject(2, "chair", np.array([0.05, 0.0, 0.5])),
        ]
        placements = generate_initial_positions(objs, library,
                                                AVG_DIMS, rng)
        placements, stage_map = gravity_aware_positions(placements,
                                                        floor)
        placements = collision_aware_positions(placements, stage_map,
                                               floor)
        a = place_points(placements[1], stride=5)
        b = place_points(placements[2], stride=5)
        d2 = (np.sum(a**2, 1)[:, None] + np.sum(b**2, 1)[None]
              - 2 * a @ b.T)
        assert np.sqrt(max(d2.min(), 0)) >= 0.05 - 1e-6


class TestExport:
    def test_full_scene_roundtrip(self, library, floor, tmp_path):
        rng = np.random.default_rng(7)
        objs = _objects(rng)
        verts, sem, ins, bboxes = synthesize_scene(
            objs, library, AVG_DIMS, rng, floor_points=floor)
        assert len(verts) == len(sem) == len(ins)
        assert bboxes.shape[1] == 7
        assert set(np.unique(ins)) >= {0, 1, 2}
        # semantic ids are modelnet ids
        for cls in CLASSES:
            assert MDN_DICT[cls] in sem

        # the quadruple feeds the detection dataset directly
        cfg = scannet_md40_config()
        # keep only classes present in the md40 config
        keep = np.isin(bboxes[:, -1], cfg.raw_ids)
        write_scene(tmp_path, "scene_aug0000_00", verts, sem, ins,
                    bboxes[keep])
        ds = DetectionDataset(cfg, tmp_path, split="all",
                              num_points=3000)
        item = ds.get(0)
        assert item["point_clouds"].shape == (3000, 3)
        assert item["box_label_mask"].sum() == keep.sum()

    def test_rotated_boxes(self, library, floor):
        rng = np.random.default_rng(8)
        objs = _objects(rng, n=3)
        verts, sem, ins, bboxes = synthesize_scene(
            objs, library, AVG_DIMS, rng, floor_points=floor,
            rotated_boxes=True)
        assert bboxes.shape[1] == 8  # + angle column
        assert (bboxes[:, 3] >= bboxes[:, 4] - 1e9 * 0).all()

    def test_hpr_removes_points(self):
        rng = np.random.default_rng(9)
        # two concentric spheres: inner one mostly hidden
        def sphere(r, n):
            v = rng.standard_normal((n, 3))
            return r * v / np.linalg.norm(v, axis=1, keepdims=True)

        outer = sphere(2.0, 2000)
        inner = sphere(0.5, 2000)
        xyz = np.concatenate([outer, inner])
        vis = hidden_point_removal(xyz, [0, 0, 10.0])
        frac_inner = np.mean(vis >= 2000)
        assert frac_inner < 0.2  # inner sphere mostly invisible


class TestMeshLibrary:
    """Mesh-version (*_obj_mesh_aug) library: .off parsing +
    area-weighted surface sampling (reference README.md:63-100 data
    contract; the reference omits the generator)."""

    def _write_off(self, path, corrupt_header=False):
        # unit cube: 8 verts, 6 quad faces (fan-triangulated on read)
        v = [(x, y, z) for z in (0, 1) for y in (0, 1) for x in (0, 1)]
        faces = [
            (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
            (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
        ]
        lines = []
        if corrupt_header:
            lines.append(f"OFF{len(v)} {len(faces)} 0")
        else:
            lines.append("OFF")
            lines.append(f"{len(v)} {len(faces)} 0")
        lines += [f"{x} {y} {z}" for x, y, z in v]
        lines += ["4 " + " ".join(map(str, f)) for f in faces]
        path.write_text("\n".join(lines) + "\n")

    def test_read_off_and_corrupt_header(self, tmp_path):
        from backtoreality_tpu.datagen.library import read_off

        p1 = tmp_path / "a.off"
        p2 = tmp_path / "b.off"
        self._write_off(p1)
        self._write_off(p2, corrupt_header=True)
        for p in (p1, p2):
            verts, faces = read_off(p)
            assert verts.shape == (8, 3)
            assert faces.shape == (12, 3)  # 6 quads fan-split

    def test_area_weighted_sampling(self, tmp_path):
        from backtoreality_tpu.datagen.library import (
            read_off,
            sample_mesh_points,
        )

        p = tmp_path / "cube.off"
        self._write_off(p)
        verts, faces = read_off(p)
        rng = np.random.default_rng(0)
        pts = sample_mesh_points(verts, faces, 30000, rng)
        # samples lie inside the mesh AABB and reach its corners
        assert pts.min() >= -1e-12 and pts.max() <= 1 + 1e-12
        np.testing.assert_allclose(pts.min(0), [0, 0, 0], atol=0.01)
        np.testing.assert_allclose(pts.max(0), [1, 1, 1], atol=0.01)
        # every sample sits ON the surface (some coord at 0 or 1)
        on_face = np.isclose(pts, 0).any(1) | np.isclose(pts, 1).any(1)
        assert on_face.all()
        # uniform density: each of the 6 equal-area faces gets ~1/6
        for axis in range(3):
            for val in (0.0, 1.0):
                frac = np.isclose(pts[:, axis], val).mean()
                assert abs(frac - 1 / 6) < 0.02

    def test_mesh_library_loads(self, tmp_path):
        from backtoreality_tpu.datagen.library import (
            load_modelnet40_mesh_library,
        )

        d = tmp_path / "table" / "train"
        d.mkdir(parents=True)
        self._write_off(d / "table_0001.off")
        lib = load_modelnet40_mesh_library(tmp_path,
                                           points_per_shape=2000)
        assert "table" in lib.shapes
        rec = lib.shapes["table"][0]
        assert rec.name == "table_0001"
        # y-up -> z-up swap keeps the unit cube a unit cube
        np.testing.assert_allclose(rec.extents, [1, 1, 1], atol=0.02)
