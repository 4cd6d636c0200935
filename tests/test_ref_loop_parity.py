"""System-level parity machinery: the reference's OWN torch training
loop (tools/ref_loop.py) runs on a fixture, its checkpoint round-trips
through tools/torch_import.py, and our eval scores it.

The full 60-epoch curve comparison lives in RESULTS.md (system-parity
section); this test keeps the machinery green: slow-gated because the
torch loop on CPU takes minutes.
"""

import json
import os
import pathlib
import sys

import numpy as np
import pytest

REF = pathlib.Path("/root/reference/detection/Votenet")
pytestmark = [
    pytest.mark.skipif(not REF.exists(), reason="reference not mounted"),
    pytest.mark.skipif(
        os.environ.get("BTR_SLOW_TESTS", "0") != "1",
        reason="torch reference loop on CPU takes minutes; "
               "set BTR_SLOW_TESTS=1 to run."),
]


def test_ref_loop_and_import_roundtrip(tmp_path):
    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.data.synthetic import write_synthetic_scans

    cfg = scannet_md40_config()
    train_d = tmp_path / "train"
    val_d = tmp_path / "val"
    write_synthetic_scans(train_d, cfg, num_scans=8, num_objects=4,
                          points_per_object=500, floor_points=1200,
                          seed=0)
    write_synthetic_scans(val_d, cfg, num_scans=4, num_objects=4,
                          points_per_object=500, floor_points=1200,
                          seed=1)

    # 1. the reference's own loop (torch CPU, stubbed ops)
    from backtoreality_tpu.tools import ref_loop

    log_dir = tmp_path / "ref_log"
    ref_loop.main([
        "--data_root", str(train_d), "--val_data_root", str(val_d),
        "--log_dir", str(log_dir), "--num_point", "1200",
        "--num_target", "16", "--max_epoch", "2", "--eval_freq", "2",
        "--batch_size", "4"])
    hist = [json.loads(line) for line in
            (log_dir / "history.jsonl").read_text().splitlines()]
    assert len(hist) == 2
    assert all(np.isfinite(h["loss"]) for h in hist)
    assert "eval_loss" in hist[-1]

    # 2. its checkpoint (reference format) through the importer
    from backtoreality_tpu.tools.torch_import import main as import_main

    imported = tmp_path / "imported.tar"
    import_main([str(log_dir / "checkpoint.tar"), "--model", "votenet",
                 "--out", str(imported)])

    # 3. scored by OUR eval stack
    import jax
    import jax.numpy as jnp

    from backtoreality_tpu.data.dataset import DetectionDataset
    from backtoreality_tpu.data.loader import DetectionDataLoader
    from backtoreality_tpu.losses import votenet as vote_losses
    from backtoreality_tpu.parallel import make_mesh, replicate
    from backtoreality_tpu.train import common
    from backtoreality_tpu.train import votenet as vn

    class F:
        no_height = False
        use_color = False
        num_target = 16
        vote_factor = 1
        cluster_sampling = "vote_fps"
        query_mode = "exact"

    model = vn.build_model(F(), cfg)
    optimizer = common.make_optimizer("adam", lr0=1e-3)
    val_ds = DetectionDataset(cfg, val_d, split="all",
                              num_points=1200, use_height=True)
    val_loader = DetectionDataLoader(val_ds, 4, shuffle=False,
                                     drop_last=False)
    sample = next(iter(val_loader))
    state = vn.init_state(
        model, optimizer,
        (jnp.asarray(sample["point_clouds"][:1]),),
        jax.random.PRNGKey(0))
    sd, epoch, _ = common.load_checkpoint(imported)
    assert epoch == 1
    params = common.partial_restore(
        jax.device_get(state.params), sd["params"])
    stats = common.partial_restore(
        jax.device_get(state.batch_stats), sd["batch_stats"])
    state = state.replace(params=params, batch_stats=stats)

    mesh = make_mesh(1)
    state = replicate(state, mesh)
    eval_step = vn.make_eval_step(model, vote_losses.get_loss, cfg)
    metrics, means = vn.evaluate(state, val_loader, eval_step, cfg,
                                 mesh, None)
    assert np.isfinite(means["loss"])
    assert 0.0 <= metrics["mAP"] <= 1.0


def _fixture(tmp_path, aug=False):
    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.data.synthetic import write_synthetic_scans

    cfg = scannet_md40_config()
    d = tmp_path / ("aug" if aug else "plain")
    write_synthetic_scans(d, cfg, num_scans=8, num_objects=4,
                          points_per_object=500, floor_points=1200,
                          seed=7 if aug else 6,
                          prefix="scene_aug" if aug else "scene")
    if aug:
        # reference aug-name convention (18-char stems)
        for f in d.glob("scene_aug*.npy"):
            f.rename(f.with_name(f.name[:16] + "_1" + f.name[16:]))
    return d


def test_ref_loop_groupfree_recipe(tmp_path):
    """The GF reference loop (AdamW dual-LR, per-iteration scheduler,
    clip 0.1) runs and logs per-prefix components + dual LRs."""
    import json as _json

    from backtoreality_tpu.tools import ref_loop

    d = _fixture(tmp_path)
    log_dir = tmp_path / "gf_log"
    ref_loop.main([
        "--model", "groupfree", "--data_root", str(d),
        "--log_dir", str(log_dir), "--num_point", "1200",
        "--num_target", "16", "--max_epoch", "1", "--eval_freq", "1",
        "--batch_size", "4", "--num_decoder_layers", "2",
        "--dim_feedforward", "64"])
    hist = [_json.loads(line) for line in
            (log_dir / "history.jsonl").read_text().splitlines()]
    assert len(hist) == 1
    row = hist[0]
    assert np.isfinite(row["loss"]) and "eval_loss" in row
    assert "last_sem_cls_loss" in row and "proposal_box_loss" in row
    assert row["lr_decoder"] == pytest.approx(row["lr"] / 10)
    # the logged loss must equal the reference composition recomputed
    # from the logged component means (GF loss_helper.py:309-314 is
    # linear in them, so per-epoch means commute); catches any
    # double-counting in the loop's stat accumulation
    expect = 10.0 * (0.8 * row["query_points_generation_loss"]
                     + (0.1 * row["sum_heads_objectness_loss"]
                        + 1.0 * row["sum_heads_box_loss"]
                        + 0.1 * row["sum_heads_sem_cls_loss"]) / 3.0)
    assert row["loss"] == pytest.approx(expect, rel=1e-4)
    # the reference-format GF checkpoint imports into our model
    from backtoreality_tpu.tools.torch_import import main as import_main

    import_main([str(log_dir / "checkpoint.tar"), "--model",
                 "groupfree", "--out", str(tmp_path / "gf_imported.tar")])


def test_ref_loop_cr_recipe(tmp_path):
    """The CenterRefine reference loop (two loaders, DA_jitter,
    epoch-ramped criterion) runs; its checkpoint imports via the
    DA_jitter converter."""
    import json as _json

    from backtoreality_tpu.tools import ref_loop

    real = _fixture(tmp_path)
    virtual = _fixture(tmp_path, aug=True)
    log_dir = tmp_path / "cr_log"
    ref_loop.main([
        "--recipe", "cr", "--center_jitter", "0.5",
        "--source_data_root", str(virtual), "--data_root", str(real),
        "--log_dir", str(log_dir), "--num_point", "1200",
        "--num_target", "16", "--max_epoch", "1", "--eval_freq", "1",
        "--batch_size", "4"])
    hist = [_json.loads(line) for line in
            (log_dir / "history.jsonl").read_text().splitlines()]
    assert len(hist) == 1
    assert np.isfinite(hist[0]["loss"])
    assert "jitter_loss" in hist[0]
    from backtoreality_tpu.tools.torch_import import main as import_main

    import_main([str(log_dir / "checkpoint.tar"), "--model",
                 "votenet_da_jitter",
                 "--out", str(tmp_path / "cr_imported.tar")])


def test_ref_loop_br_recipe(tmp_path):
    """The BR reference loop (`train_Votenet_BR.py:267-341`: VoteNet_DA,
    full-label virtual SOURCE + weak jittered TARGET, get_loss_DA) runs;
    its checkpoint imports via the new votenet_da converter."""
    import json as _json

    from backtoreality_tpu.tools import ref_loop

    real = _fixture(tmp_path)
    virtual = _fixture(tmp_path, aug=True)
    log_dir = tmp_path / "br_log"
    ref_loop.main([
        "--recipe", "br", "--center_jitter", "0.5",
        "--source_data_root", str(virtual), "--data_root", str(real),
        "--log_dir", str(log_dir), "--num_point", "1200",
        "--num_target", "16", "--max_epoch", "1", "--eval_freq", "1",
        "--batch_size", "4"])
    hist = [_json.loads(line) for line in
            (log_dir / "history.jsonl").read_text().splitlines()]
    assert len(hist) == 1
    row = hist[0]
    assert np.isfinite(row["loss"])
    # DA components logged from end_points_S (loss_helper.py:578-662)
    assert "vote_loss" in row and "obj_acc" in row
    assert "mAP" in row  # target-domain eval
    from backtoreality_tpu.tools.torch_import import main as import_main

    import_main([str(log_dir / "checkpoint.tar"), "--model",
                 "votenet_da", "--out", str(tmp_path / "br_imported.tar")])


def test_ref_loop_groupfree_br_recipe(tmp_path):
    """The GF BR reference loop (`train_GF_BR.py:290-383`:
    GroupFreeDetector_DA, full-label SOURCE + weak jittered TARGET,
    get_loss_DA over zip(S, cycle(T))); its checkpoint imports via the
    groupfree_da converter."""
    import json as _json

    from backtoreality_tpu.tools import ref_loop

    real = _fixture(tmp_path)
    virtual = _fixture(tmp_path, aug=True)
    log_dir = tmp_path / "gf_br_log"
    ref_loop.main([
        "--model", "groupfree", "--recipe", "br",
        "--center_jitter", "0.5",
        "--source_data_root", str(virtual), "--data_root", str(real),
        "--log_dir", str(log_dir), "--num_point", "1200",
        "--num_target", "16", "--max_epoch", "1", "--eval_freq", "1",
        "--batch_size", "4", "--num_decoder_layers", "2",
        "--dim_feedforward", "64"])
    hist = [_json.loads(line) for line in
            (log_dir / "history.jsonl").read_text().splitlines()]
    assert len(hist) == 1
    row = hist[0]
    assert np.isfinite(row["loss"])
    # stats accumulate from the TARGET end_points (train_GF_BR.py:364)
    assert "last_center_loss" in row and "query_points_generation_loss" in row
    assert "mAP" in row  # target-domain eval
    from backtoreality_tpu.tools.torch_import import main as import_main

    import_main([str(log_dir / "checkpoint.tar"), "--model",
                 "groupfree_da", "--out",
                 str(tmp_path / "gf_br_imported.tar")])


def test_ref_loop_groupfree_wsb_recipe(tmp_path):
    """The GF weak reference loop (`train_GF_WSB.py:157-218`:
    center-jittered dataset + get_loss_weak, FSB harness otherwise)."""
    import json as _json

    from backtoreality_tpu.tools import ref_loop

    d = _fixture(tmp_path)
    log_dir = tmp_path / "gf_wsb_log"
    ref_loop.main([
        "--model", "groupfree", "--recipe", "wsb",
        "--center_jitter", "0.5", "--data_root", str(d),
        "--log_dir", str(log_dir), "--num_point", "1200",
        "--num_target", "16", "--max_epoch", "1", "--eval_freq", "1",
        "--batch_size", "4", "--num_decoder_layers", "2",
        "--dim_feedforward", "64"])
    hist = [_json.loads(line) for line in
            (log_dir / "history.jsonl").read_text().splitlines()]
    assert len(hist) == 1
    row = hist[0]
    assert np.isfinite(row["loss"]) and "eval_loss" in row
    # weak criterion writes the weak KPS term
    # (GF loss_helper.py:567-571)
    assert "query_points_generation_loss" in row
