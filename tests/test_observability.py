"""Observability + schedule-on-device tests."""

import json

import numpy as np
import pytest

from backtoreality_tpu.train import common
from backtoreality_tpu.train.observability import ScalarHistory, StepTimer


def test_scalar_history(tmp_path):
    h = ScalarHistory(tmp_path)
    h.append(0, {"loss": 1.5, "arr": np.zeros(3)}, lr=0.1)
    h.append(1, {"loss": np.float32(1.25)})
    rows = [json.loads(line)
            for line in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert rows[0] == {"step": 0, "lr": 0.1, "loss": 1.5}
    assert rows[1]["loss"] == 1.25


def test_step_timer():
    t = StepTimer()
    t.tick(8)
    t.tick(8)
    assert t.scenes == 16
    assert t.scenes_per_sec > 0


class _Flags:
    warmup_epoch = 1
    warmup_multiplier = 100
    lr_scheduler = "step"
    lr_decay_epochs = [280, 340]
    lr_decay_rate = 0.1
    max_epoch = 400


def test_gf_schedule_matches_host_mirror():
    flags = _Flags()
    spe = 10
    sched = common.make_gf_schedule(6e-3, flags, spe)
    host = common.warmup_step_lr(6e-3, 1, 0.01, [279, 339], 0.1, spe)
    # after warmup the on-device schedule matches the host mirror
    for it in (10, 100, 2800, 3000, 3500):
        assert float(sched(it)) == pytest.approx(host(it), rel=1e-5), it
    # warmup starts near base/multiplier and ends at base
    assert float(sched(0)) == pytest.approx(6e-5, rel=1e-3)
    assert float(sched(10)) == pytest.approx(6e-3, rel=1e-5)


def test_gf_schedule_cosine():
    flags = _Flags()
    flags.lr_scheduler = "cosine"
    flags.warmup_epoch = -1
    sched = common.make_gf_schedule(6e-3, flags, 10)
    assert float(sched(0)) == pytest.approx(6e-3, rel=1e-5)
    assert float(sched(400 * 10)) == pytest.approx(1e-6, rel=1e-2)
