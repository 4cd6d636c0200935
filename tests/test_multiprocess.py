"""Automated multi-process data parallelism test.

Launches TWO real OS processes of the VoteNet FSB driver with the
manual rendezvous env (BTR_COORDINATOR / BTR_NUM_PROCESSES /
BTR_PROCESS_ID — the torch MASTER_ADDR/WORLD_SIZE/RANK analog,
`train_GF_FSB.py:450-456` launch contract) on a tiny synthetic
fixture, and asserts the DDP contract: identical global loss on both
ranks, rank-0-only checkpointing, rank-suffixed logs, per-rank eval,
and resume from the written checkpoint.
"""

import os
import pathlib
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

from backtoreality_tpu.data import scannet_md40_config
from backtoreality_tpu.data.synthetic import write_synthetic_scans

REPO = pathlib.Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _child_env(rank: int, nproc: int, port: int) -> dict:
    env = dict(os.environ)
    # each child is a plain 1-CPU-device jax process; the mesh is the
    # 2-device union. Strip the parent's 8-virtual-device XLA_FLAGS,
    # and raise the gloo rendezvous deadline (default ~30 s) above the
    # first-compile skew two ranks can accumulate on a shared CPU.
    env["XLA_FLAGS"] = "--xla_cpu_collective_timeout_seconds=900"
    env["JAX_PLATFORMS"] = "cpu"
    env["BTR_PLATFORM"] = "cpu"  # wins over sitecustomize re-pinning
    env["BTR_COORDINATOR"] = f"127.0.0.1:{port}"
    env["BTR_NUM_PROCESSES"] = str(nproc)
    env["BTR_PROCESS_ID"] = str(rank)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH",
                                                         "")
    return env


def _launch(args, rank, nproc, port, log_dir):
    cmd = [sys.executable, "-m",
           "backtoreality_tpu.train.votenet_fsb"] + args
    return subprocess.Popen(
        cmd, env=_child_env(rank, nproc, port),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=log_dir)


def _epoch_losses(log_text: str) -> dict[int, float]:
    out = {}
    for m in re.finditer(r"epoch (\d+) .*?loss ([\d.]+)", log_text):
        out[int(m.group(1))] = float(m.group(2))
    return out


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    cfg = scannet_md40_config()
    d = tmp_path_factory.mktemp("mp_synth")
    write_synthetic_scans(d, cfg, num_scans=8, num_objects=3,
                          points_per_object=300, floor_points=800)
    return d


def _run_pair(args, log_dir, timeout=1200, attempts=2):
    """Launch the 2-rank pair; retry once on failure.

    The retry absorbs first-compile skew on starved CI hosts: XLA's
    gloo rendezvous has a fixed ~30 s connect deadline, and two
    processes compiling the train step on one shared CPU can reach
    their first collective more than 30 s apart. The second attempt
    rides the persistent CPU compilation cache, so both ranks reach
    the collective within seconds. A rank TIMEOUT also consumes an
    attempt (it is the same starved-host mode, just slower): the pair
    is killed and relaunched rather than failing the test outright.
    """
    last = None
    for attempt in range(attempts):
        port = _free_port()
        procs = [_launch(args, r, 2, port, log_dir) for r in range(2)]
        outs = []
        timed_out = False
        for p in procs:
            try:
                out, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                for q in procs:
                    q.wait()
                timed_out = True
                break
            outs.append(out)
        if timed_out:
            last = [(None, f"rank pair timed out after {timeout}s "
                           f"(attempt {attempt + 1})")]
            continue
        if all(p.returncode == 0 for p in procs):
            return outs
        last = [(p.returncode, out) for p, out in zip(procs, outs)]
    raise AssertionError(
        "2-process pair failed twice; rank outputs:\n"
        + "\n".join(f"rc={rc}:\n{out[-3000:]}" for rc, out in last))


def test_two_process_fsb_and_resume(fixture_dir, tmp_path):
    log_dir = tmp_path / "log_mp"
    log_dir.mkdir()
    common_args = [
        "--data_root", str(fixture_dir),
        "--train_split", "all", "--val_split", "all",
        "--num_point", "2000", "--num_target", "32",
        "--batch_size", "2", "--eval_freq", "2",
        "--log_dir", str(log_dir), "--multihost",
        "--lr_decay_steps", "80,120,160",
    ]
    _run_pair(common_args + ["--max_epoch", "2"], tmp_path)

    log0 = (log_dir / "log_train.txt").read_text()
    log1_path = log_dir / "log_train.txt.rank1"
    assert log1_path.exists(), "rank-1 log missing"
    log1 = log1_path.read_text()

    # both ranks observed the SAME global loss each epoch (global-batch
    # train step; aux means are identical on every process)
    l0, l1 = _epoch_losses(log0), _epoch_losses(log1)
    assert sorted(l0) == [0, 1]
    assert sorted(l1) == [0, 1]
    for e in (0, 1):
        assert l0[e] == pytest.approx(l1[e], abs=1e-4), (
            f"rank loss divergence at epoch {e}: {l0[e]} vs {l1[e]}")
    assert np.isfinite(list(l0.values())).all()

    # rank-0-only checkpoint: exactly one checkpoint file in log_dir
    ckpts = sorted(log_dir.glob("*.tar"))
    assert [c.name for c in ckpts] == ["checkpoint.tar"]

    # per-rank eval ran (epoch 2 with eval_freq=2): both logs carry the
    # eval loss line
    assert "eval" in log0 and "eval" in log1

    # resume: both ranks continue from the rank-0 checkpoint for one
    # more epoch and agree again
    _run_pair(common_args + [
        "--max_epoch", "3", "--resume",
        "--checkpoint_path", str(log_dir / "checkpoint.tar")],
        tmp_path)
    log0b = (log_dir / "log_train.txt").read_text()
    l0b = _epoch_losses(log0b)
    assert 2 in l0b, f"resume did not run epoch 2: {sorted(l0b)}"
    l1b = _epoch_losses(log1_path.read_text())
    assert l0b[2] == pytest.approx(l1b[2], abs=1e-4)
