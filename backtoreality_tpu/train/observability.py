"""Training observability: scalar history, step timing, profiler hooks.

The reference's TensorBoard writer exists but is never wired in
(`utils/tf_logger.py`, import commented at `train_Votenet_FSB.py:39`);
its actual observability is stdout prints + `log_train.txt`. Here the
first-class story is:

* :class:`ScalarHistory` — append-only JSONL of per-epoch scalar means
  (plottable, machine-readable, rank-0 only);
* :class:`StepTimer` — wall-clock step/epoch timing with scenes/s;
* :func:`profile` — a `jax.profiler` trace context (`--profile_dir`),
  the TPU-native replacement for nvprof-style profiling.
"""

from __future__ import annotations

import contextlib
import json
import pathlib
import time

import jax


class ScalarHistory:
    """Append scalar dicts to `<log_dir>/metrics.jsonl` (process 0)."""

    def __init__(self, log_dir, name: str = "metrics"):
        self.path = None
        if log_dir is not None and jax.process_index() == 0:
            d = pathlib.Path(log_dir)
            d.mkdir(parents=True, exist_ok=True)
            self.path = d / f"{name}.jsonl"

    def append(self, step: int, scalars: dict, **extra):
        if self.path is None:
            return
        row = {"step": step, **extra}
        for key, v in scalars.items():
            try:
                row[key] = float(v)
            except (TypeError, ValueError):
                continue
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")


class StepTimer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.time()
        self.steps = 0
        self.scenes = 0

    def tick(self, batch_size: int):
        self.steps += 1
        self.scenes += batch_size

    @property
    def elapsed(self) -> float:
        return time.time() - self.t0

    @property
    def scenes_per_sec(self) -> float:
        return self.scenes / max(self.elapsed, 1e-9)


@contextlib.contextmanager
def profile(profile_dir):
    """`jax.profiler` trace context; no-op when profile_dir is None."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(str(profile_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
