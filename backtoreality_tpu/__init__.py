"""backtoreality-tpu: a TPU-native JAX/XLA/Pallas framework with the
capabilities of BackToReality (CVPR 2022) weakly-supervised 3D detection.

Subpackages
-----------
ops       Point-cloud op library (FPS, ball query, grouping, 3-NN interp,
          chamfer) — pure-JAX reference impls + Pallas TPU kernels.
nn        PointNet++ neural layers (SharedMLP, BatchNorm w/ momentum
          schedule, SA/FP modules), channels-last.
models    VoteNet and GroupFree3D detector graphs (flax.linen).
losses    Training criteria for FSB/WSB/BR/BR+CenterRefine.
data      Dataset configs, detection datasets, augmentation, host loaders.
eval      Box geometry, NMS, AP evaluation (host-side numpy).
parallel  Device mesh / shard_map data-parallel training utilities.
train     Training drivers mirroring the reference CLI entry points.
datagen   Virtual-scene synthesis (ModelNet40 shapes into room layouts).
"""

__version__ = "0.1.0"

# Platform override knob: some hosted environments pin jax_platforms in
# a sitecustomize AFTER env vars are read, so JAX_PLATFORMS alone can't
# force a backend. BTR_PLATFORM=cpu (set before the first jax device
# use, e.g. for CPU-only multi-process tests/launches) wins over both.
import os as _os

if _os.environ.get("BTR_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["BTR_PLATFORM"])
