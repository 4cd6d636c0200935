"""Preemption-guard test: SIGTERM triggers a checkpoint save."""

import os
import signal

import numpy as np
import pytest

import jax.numpy as jnp

from backtoreality_tpu.train import common


def test_sigterm_saves_latest_state(tmp_path):
    state = common.TrainState(
        step=jnp.asarray(5, jnp.int32),
        params={"w": jnp.full((2,), 3.0)},
        batch_stats={"bn": {"mean": jnp.zeros(2)}},
        opt_state={"m": jnp.ones(2)},
    )
    path = tmp_path / "preempt.tar"
    guard = common.PreemptionGuard(path, logger=None)
    try:
        guard.update(state, epoch=12)
        with pytest.raises(SystemExit) as exc:
            os.kill(os.getpid(), signal.SIGTERM)
            # the handler runs synchronously in this thread
        assert exc.value.code == 143
        sd, epoch, _ = common.load_checkpoint(path)
        assert epoch == 12
        np.testing.assert_array_equal(
            np.asarray(sd["params"]["w"]), np.full((2,), 3.0))
    finally:
        signal.signal(signal.SIGTERM, signal.SIG_DFL)


def test_snapshot_survives_buffer_donation(tmp_path):
    """The jitted train steps DONATE the state's device buffers one
    step after guard.update() — the guard must snapshot to host, not
    hold device references (regression test for the round-2 fix)."""
    import jax

    state = common.TrainState(
        step=jnp.asarray(7, jnp.int32),
        params={"w": jnp.full((2,), 4.0)},
        batch_stats={"bn": {"mean": jnp.zeros(2)}},
        opt_state={"m": jnp.ones(2)},
    )
    path = tmp_path / "donated.tar"
    guard = common.PreemptionGuard(path, logger=None)
    try:
        guard.update(state, epoch=3)
        # simulate donation: delete every device buffer of the state
        for leaf in jax.tree_util.tree_leaves(state):
            leaf.delete()
        with pytest.raises(SystemExit):
            os.kill(os.getpid(), signal.SIGTERM)
        sd, epoch, _ = common.load_checkpoint(path)
        assert epoch == 3
        np.testing.assert_array_equal(
            np.asarray(sd["params"]["w"]), np.full((2,), 4.0))
    finally:
        signal.signal(signal.SIGTERM, signal.SIG_DFL)


def test_no_save_without_state(tmp_path):
    path = tmp_path / "nothing.tar"
    guard = common.PreemptionGuard(path, logger=None)
    try:
        with pytest.raises(SystemExit):
            os.kill(os.getpid(), signal.SIGTERM)
        assert not path.exists()
    finally:
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
