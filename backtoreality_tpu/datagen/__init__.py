"""Virtual-scene synthesis: place ModelNet40-style shapes into room
layouts with gravity- and collision-aware refinement, then export
detection training scans.

Host-side numpy pipeline (inherently irregular — not a TPU workload),
re-designed from `data_generation/{ScanNet,Matterport3D}` with the
open3d dependency removed (numpy/scipy/cv2 only) and the shape source
abstracted: plug in real ModelNet40 clouds when available, or the
procedural shape library for tests and data-free smoke runs.
"""

from backtoreality_tpu.datagen.shapes import (
    analyze_shape,
    min_area_rect,
    ShapeRecord,
)
from backtoreality_tpu.datagen.library import (
    ShapeLibrary,
    procedural_library,
    load_modelnet40_library,
)
from backtoreality_tpu.datagen.synthesis import (
    SceneObject,
    generate_initial_positions,
    gravity_aware_positions,
    collision_aware_positions,
    export_scene,
    synthesize_scene,
)
