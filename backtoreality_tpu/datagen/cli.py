"""Datagen CLI: real-scene export and virtual-scene synthesis.

Mirrors the reference drivers:
* `export-real`  <- `batch_load_scannet_data.py` (scans -> npy quadruple)
* `synthesize`   <- `scannet_scene_synthesis.py` +
                    `batch_load_scannet_data_virtual.py`
                    (scans -> *_obj_aug virtual detection data), with an
                    optional scarce-class augmentation pass
                    (`scannet_scene_synthesis.py:557-638`, simplified:
                    classes below the median scene frequency are
                    inserted at free floor locations of compatible
                    scenes as extra `scene_aug*` scans).

Usage:
  python -m backtoreality_tpu.datagen.cli export-real \
      --scans_dir scans --out scannet_train_detection_data_md40
  python -m backtoreality_tpu.datagen.cli synthesize \
      --scans_dir scans --out scannet_train_detection_data_md40_obj_aug \
      [--modelnet_dir modelnet40_normal_resampled | --procedural]
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np

from backtoreality_tpu.data.config import ASSETS
from backtoreality_tpu.datagen.library import (
    MODELNET40_CLASSES,
    load_modelnet40_library,
    procedural_library,
)
from backtoreality_tpu.datagen.scannet_adapter import (
    export_scan,
    export_weak_objects,
)
from backtoreality_tpu.datagen.synthesis import (
    SceneObject,
    synthesize_scene,
    write_scene,
)

# classes eligible for scarce-class insertion (small, free-standing)
INSERTABLE = ("bottle", "cup", "keyboard", "laptop", "lamp", "plant")


def load_avg_dims():
    """{class_name: 6-tuple} from the frozen object40_property table."""
    prop = np.load(ASSETS / "datagen_scannet" / "object40_property.npy",
                   allow_pickle=True, encoding="bytes").item()
    out = {}
    for mid, vals in prop.items():
        out[MODELNET40_CLASSES[int(mid) - 1]] = tuple(
            float(v) for v in vals[:6])
    return out


def _iter_scans(scans_dir):
    for d in sorted(pathlib.Path(scans_dir).iterdir()):
        if d.is_dir() and (d / f"{d.name}_vh_clean_2.ply").exists():
            yield d


def cmd_export_real(args):
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for scan_dir in _iter_scans(args.scans_dir):
        verts, sem, ins, bboxes = export_scan(
            scan_dir, max_points=args.max_points, rng=rng)
        np.save(out / f"{scan_dir.name}_vert.npy",
                verts.astype(np.float32))
        np.save(out / f"{scan_dir.name}_sem_label.npy", sem)
        np.save(out / f"{scan_dir.name}_ins_label.npy", ins)
        np.save(out / f"{scan_dir.name}_bbox.npy", bboxes)
        print(f"{scan_dir.name}: {len(verts)} pts, {len(bboxes)} boxes")


def _build_library(args, classes):
    if args.modelnet_dir:
        return load_modelnet40_library(
            args.modelnet_dir, classes=classes,
            max_shapes_per_class=args.max_shapes_per_class)
    return procedural_library(classes,
                              rng=np.random.default_rng(args.seed))


def cmd_synthesize(args):
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    avg_dims = load_avg_dims()
    rng = np.random.default_rng(args.seed)

    scene_records = []
    needed_classes = set()
    for scan_dir in _iter_scans(args.scans_dir):
        objects, floor_points, _ = export_weak_objects(scan_dir)
        if not objects:
            continue
        scene_records.append((scan_dir.name, objects, floor_points))
        needed_classes |= {o.class_name for o in objects}
    needed_classes |= set(INSERTABLE)
    library = _build_library(args, sorted(needed_classes))

    class_counts = {c: 0 for c in needed_classes}
    for _, objects, _ in scene_records:
        for o in objects:
            class_counts[o.class_name] += 1

    for name, objects, floor_points in scene_records:
        verts, sem, ins, bboxes = synthesize_scene(
            objects, library, avg_dims, rng,
            floor_points=floor_points, hpr=args.hpr)
        write_scene(out, name, verts, sem, ins, bboxes)
        print(f"{name}: {len(verts)} pts, {len(bboxes)} boxes")

    if args.num_aug > 0 and scene_records:
        # scarce-class augmentation: insert under-represented classes
        counts = sorted(class_counts.values())
        median = counts[len(counts) // 2]
        scarce = [c for c in INSERTABLE
                  if class_counts.get(c, 0) <= median]
        for k in range(args.num_aug):
            name, objects, floor_points = scene_records[
                k % len(scene_records)]
            extra = list(objects)
            next_oid = max(o.oid for o in objects) + 1
            for cls in scarce[: args.aug_objects]:
                if cls not in library.shapes:
                    continue
                lo = floor_points[:, 0:2].min(0) if len(floor_points) \
                    else np.array([-2.0, -2.0])
                hi = floor_points[:, 0:2].max(0) if len(floor_points) \
                    else np.array([2.0, 2.0])
                pos = lo + rng.random(2) * (hi - lo)
                extra.append(SceneObject(
                    oid=next_oid, class_name=cls,
                    center=np.array([pos[0], pos[1], 0.5])))
                next_oid += 1
            verts, sem, ins, bboxes = synthesize_scene(
                extra, library, avg_dims, rng,
                floor_points=floor_points, hpr=args.hpr)
            write_scene(out, f"scene_aug{k:03d}_{name}", verts, sem,
                        ins, bboxes)
            print(f"scene_aug{k:03d}_{name}: +{len(extra)-len(objects)} "
                  f"scarce objects")


def cmd_organize_matterport(args):
    from backtoreality_tpu.datagen import matterport_adapter as mp

    names = mp.organize_regions(args.houses_dir, args.out)
    print(f"organized {len(names)} regions")


def cmd_export_real_matterport(args):
    from backtoreality_tpu.datagen import matterport_adapter as mp

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for scene_dir in sorted(pathlib.Path(args.scans_dir).iterdir()):
        if not scene_dir.is_dir():
            continue
        verts, sem, ins, bboxes = mp.export_region(
            scene_dir, max_points=args.max_points, rng=rng)
        np.save(out / f"{scene_dir.name}_vert.npy",
                verts.astype(np.float32))
        np.save(out / f"{scene_dir.name}_sem_label.npy", sem)
        np.save(out / f"{scene_dir.name}_ins_label.npy", ins)
        np.save(out / f"{scene_dir.name}_bbox.npy", bboxes)
        print(f"{scene_dir.name}: {len(verts)} pts, {len(bboxes)} boxes")


def cmd_synthesize_matterport(args):
    from backtoreality_tpu.datagen import matterport_adapter as mp

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    avg_dims = load_avg_dims()
    rng = np.random.default_rng(args.seed)
    scene_records = []
    needed = set()
    for scene_dir in sorted(pathlib.Path(args.scans_dir).iterdir()):
        if not scene_dir.is_dir():
            continue
        objects, floor_points, _ = mp.export_weak_objects(scene_dir)
        if not objects:
            continue
        scene_records.append((scene_dir.name, objects, floor_points))
        needed |= {o.class_name for o in objects}
    library = _build_library(args, sorted(needed))
    for name, objects, floor_points in scene_records:
        verts, sem, ins, bboxes = synthesize_scene(
            objects, library, avg_dims, rng,
            floor_points=floor_points, hpr=args.hpr,
            rotated_boxes=True)
        write_scene(out, name, verts, sem, ins, bboxes)
        print(f"{name}: {len(verts)} pts, {len(bboxes)} rotated boxes")


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("organize-matterport")
    p.add_argument("--houses_dir", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_organize_matterport)

    p = sub.add_parser("export-real-matterport")
    p.add_argument("--scans_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--max_points", type=int, default=50000)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_export_real_matterport)

    p = sub.add_parser("synthesize-matterport")
    p.add_argument("--scans_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--modelnet_dir", default=None)
    p.add_argument("--procedural", action="store_true")
    p.add_argument("--max_shapes_per_class", type=int, default=20)
    p.add_argument("--hpr", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_synthesize_matterport)

    p = sub.add_parser("export-real")
    p.add_argument("--scans_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--max_points", type=int, default=50000)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_export_real)

    p = sub.add_parser("synthesize")
    p.add_argument("--scans_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--modelnet_dir", default=None)
    p.add_argument("--procedural", action="store_true")
    p.add_argument("--max_shapes_per_class", type=int, default=20)
    p.add_argument("--hpr", action="store_true")
    p.add_argument("--num_aug", type=int, default=0)
    p.add_argument("--aug_objects", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_synthesize)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
