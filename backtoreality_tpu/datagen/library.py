"""Shape libraries: per-class collections of analyzed shapes.

Sources:
* :func:`load_modelnet40_library` — the real ModelNet40 10k-point txt
  files (y-up, swapped to z-up like `modelnet40_tools.py:17`);
* :func:`procedural_library` — parametric stand-ins (boxes, tabletops
  on legs, thin panels) so the synthesis pipeline runs and is testable
  without the ModelNet40 download.
"""

from __future__ import annotations

import pathlib

import numpy as np

from backtoreality_tpu.datagen.shapes import ShapeRecord, analyze_shape

# ModelNet40 class name -> 1-based id (`scannet_scene_synthesis.py:445`)
MODELNET40_CLASSES = [
    "airplane", "bathtub", "bed", "bench", "bookshelf", "bottle",
    "bowl", "car", "chair", "cone", "cup", "curtain", "desk", "door",
    "dresser", "flower_pot", "glass_box", "guitar", "keyboard", "lamp",
    "laptop", "mantel", "monitor", "night_stand", "person", "piano",
    "plant", "radio", "range_hood", "sink", "sofa", "stairs", "stool",
    "table", "tent", "toilet", "tv_stand", "vase", "wardrobe", "xbox",
]
MDN_DICT = {n: i + 1 for i, n in enumerate(MODELNET40_CLASSES)}

SUPPORTER_CLASSES = ("tv_stand", "desk", "bed", "bookshelf", "table",
                     "night_stand")
# classes that may sit on supporters (`scannet_scene_synthesis.py:210`)
SUPPORTED_CLASSES = ("monitor", "plant", "lamp", "sink", "cup",
                     "keyboard", "bottle", "laptop")
# scale rules (`scannet_scene_synthesis.py:112-119`)
HEIGHT_ONLY_CLASSES = ("curtain", "door", "sofa", "desk")
AREA_ONLY_CLASSES = ("keyboard",)


class ShapeLibrary:
    """class name -> list[ShapeRecord]."""

    def __init__(self, shapes: dict[str, list[ShapeRecord]]):
        self.shapes = shapes

    def classes(self):
        return sorted(self.shapes)

    def find_nearest(self, class_name: str, ls_ratio: float,
                     require_support: bool = False) -> ShapeRecord:
        """Shape whose footprint aspect ratio is closest to ls_ratio
        (`find_nearest_object`, `scannet_scene_synthesis.py:54-68`)."""
        best, best_d = None, np.inf
        for rec in self.shapes[class_name]:
            if require_support and not rec.supportable:
                continue
            d = abs(rec.ls_ratio - ls_ratio)
            if d < best_d:
                best, best_d = rec, d
        if best is None and require_support:
            return self.find_nearest(class_name, ls_ratio, False)
        if best is None:
            raise KeyError(f"no shapes for class {class_name!r}")
        return best


def load_modelnet40_library(root, classes=None,
                            max_shapes_per_class: int | None = None
                            ) -> ShapeLibrary:
    """Read ModelNet40 txt clouds (x,y,z,nx,ny,nz per line, y-up)."""
    root = pathlib.Path(root)
    shapes: dict[str, list[ShapeRecord]] = {}
    for cls_dir in sorted(root.iterdir()):
        if not cls_dir.is_dir():
            continue
        name = cls_dir.name
        if classes is not None and name not in classes:
            continue
        recs = []
        txts = sorted(cls_dir.glob("*.txt"))
        if max_shapes_per_class:
            txts = txts[:max_shapes_per_class]
        for txt in txts:
            pts = np.loadtxt(txt, delimiter=",")[:, 0:3]
            pts[:, [1, 2]] = pts[:, [2, 1]]  # y-up -> z-up
            recs.append(analyze_shape(txt.stem, pts))
        if recs:
            shapes[name] = recs
    return ShapeLibrary(shapes)


def _box_shape(rng, lx, ly, lz, n=10000):
    """Surface-sampled box centered at origin, resting z in [-lz/2, lz/2]."""
    areas = np.array([lx * ly, lx * ly, lx * lz, lx * lz, ly * lz,
                      ly * lz])
    face = rng.choice(6, size=n, p=areas / areas.sum())
    u, v = rng.random(n) - 0.5, rng.random(n) - 0.5
    pts = np.zeros((n, 3))
    half = np.array([lx, ly, lz]) / 2
    for f in range(6):
        m = face == f
        axis = f // 2
        sign = 1.0 if f % 2 == 0 else -1.0
        other = [a for a in range(3) if a != axis]
        pts[m, axis] = sign * half[axis]
        pts[m, other[0]] = u[m] * [lx, ly, lz][other[0]]
        pts[m, other[1]] = v[m] * [lx, ly, lz][other[1]]
    return pts


def _table_shape(rng, lx, ly, lz, top_frac=0.15, n=10000):
    """Flat top slab on four legs — a supportable shape."""
    n_top = int(n * 0.6)
    top = _box_shape(rng, lx, ly, lz * top_frac, n_top)
    top[:, 2] += lz * (1 - top_frac / 2) - lz / 2
    legs = []
    n_leg = (n - n_top) // 4
    for sx in (-1, 1):
        for sy in (-1, 1):
            leg = _box_shape(rng, lx * 0.08, ly * 0.08,
                             lz * (1 - top_frac), n_leg)
            leg[:, 0] += sx * lx * 0.4
            leg[:, 1] += sy * ly * 0.4
            leg[:, 2] -= lz * top_frac / 2
            legs.append(leg)
    return np.concatenate([top] + legs)


def procedural_library(classes, rng=None, shapes_per_class: int = 3
                       ) -> ShapeLibrary:
    """Parametric stand-in shapes for every requested class."""
    rng = rng or np.random.default_rng(0)
    shapes: dict[str, list[ShapeRecord]] = {}
    for name in classes:
        recs = []
        for i in range(shapes_per_class):
            ar = 1.0 + rng.random() * 1.5  # aspect variety
            if name in SUPPORTER_CLASSES:
                pts = _table_shape(rng, ar, 1.0, 0.8 + rng.random() * 0.4)
            elif name in ("curtain", "door"):
                pts = _box_shape(rng, ar, 0.08, 2.0)
            else:
                pts = _box_shape(rng, ar, 1.0, 0.6 + rng.random())
            recs.append(analyze_shape(f"{name}_{i:04d}", pts))
        shapes[name] = recs
    return ShapeLibrary(shapes)


def compute_class_avg_dims(library: ShapeLibrary,
                           target_heights: dict[str, float] | None = None
                           ) -> dict[str, tuple]:
    """Per-class average dims in both xy and yx orientations — the
    `object40_property.npy` regenerator
    (`data_generation/ScanNet/meta_data/object_property.py` analog).
    Shapes are normalized clouds, so dims are scaled to an optional
    per-class target height (default 1.0)."""
    out = {}
    for name, recs in library.shapes.items():
        dims = np.stack([r.extents for r in recs])
        scale = 1.0
        if target_heights and name in target_heights:
            scale = target_heights[name] / max(dims[:, 2].mean(), 1e-9)
        dx, dy, dz = (dims.mean(0) * scale).tolist()
        out[name] = (dx, dy, dz, dy, dx, dz)
    return out
