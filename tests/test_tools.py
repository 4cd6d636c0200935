"""Tests for the measurement/reporting tools (tools/mfu.py peak
lookups, tools/parity_report.py matched-epoch joining)."""

import json

from backtoreality_tpu.tools import mfu
from backtoreality_tpu.tools import parity_report


def test_mfu_peak_lookup():
    bf16, f32 = mfu._peaks("TPU v5 lite")
    assert (bf16, f32) == (197.0, 98.5)
    assert mfu._hbm_peak("TPU v5 lite") == 819.0
    assert mfu._peaks("TPU v4") == (275.0, 137.5)
    assert mfu._hbm_peak("unknown-kind") is None
    assert mfu._peaks("unknown-kind") == (None, None)


def test_parity_report_matched_epochs(tmp_path):
    ref_dir = tmp_path / "ref"
    ours_dir = tmp_path / "ours"
    ref_dir.mkdir()
    ours_dir.mkdir()
    ref_rows = [
        {"epoch": 0, "loss": 30.0, "lr": 1e-3},
        {"epoch": 1, "loss": 20.0, "lr": 1e-3,
         "mAP": 0.10, "AR": 0.30, "eval_loss": 21.0},
        {"epoch": 2, "loss": 15.0, "lr": 1e-3},
    ]
    ours_rows = [
        {"step": 0, "loss": 31.0, "lr": 1e-3},
        {"step": 1, "loss": 19.0, "lr": 1e-3},
        {"step": 1, "kind": "eval", "mAP": 0.12, "AR": 0.28},
        # epoch 3 exists only on our side -> must not appear in the join
        {"step": 3, "loss": 10.0, "lr": 1e-3},
    ]
    (ref_dir / "history.jsonl").write_text(
        "\n".join(json.dumps(r) for r in ref_rows))
    (ours_dir / "metrics.jsonl").write_text(
        "\n".join(json.dumps(r) for r in ours_rows))

    report = parity_report.build_report(str(ref_dir), str(ours_dir))
    assert [r["epoch"] for r in report["loss"]] == [0, 1]
    assert report["loss"][0] == {
        "epoch": 0, "ours_loss": 31.0, "ref_loss": 30.0}
    assert report["eval"] == [{
        "epoch": 1, "ours_mAP": 0.12, "ref_mAP": 0.10,
        "ours_AR": 0.28, "ref_AR": 0.30}]

    # CLI path prints and returns the same report
    out = parity_report.main([
        "--ref_dir", str(ref_dir), "--ours_dir", str(ours_dir)])
    assert out == report


def test_parity_report_component_ratios(tmp_path):
    """Per-component ours/ref ratios at matched epochs: only shared
    *_loss keys, VoteNet ordering first, zero-valued ref terms and
    eval_loss excluded, GF-style prefix keys picked up generically."""
    ref_dir = tmp_path / "ref"
    ours_dir = tmp_path / "ours"
    ref_dir.mkdir()
    ours_dir.mkdir()
    ref_rows = [
        {"epoch": 0, "loss": 30.0, "vote_loss": 2.0,
         "objectness_loss": 0.5, "heading_cls_loss": 0.0,
         "proposal_sem_cls_loss": 1.0, "ref_only_loss": 9.0,
         "eval_loss": 31.0},
        {"epoch": 1, "loss": 20.0},  # no components -> no comp row
    ]
    ours_rows = [
        {"step": 0, "loss": 31.0, "vote_loss": 1.0,
         "objectness_loss": 1.0, "heading_cls_loss": 0.1,
         "proposal_sem_cls_loss": 2.0, "eval_loss": 30.0},
        {"step": 1, "loss": 19.0},
    ]
    (ref_dir / "history.jsonl").write_text(
        "\n".join(json.dumps(r) for r in ref_rows))
    (ours_dir / "metrics.jsonl").write_text(
        "\n".join(json.dumps(r) for r in ours_rows))

    report = parity_report.build_report(str(ref_dir), str(ours_dir))
    assert report["components"] == [{
        "epoch": 0,
        "vote_loss": 0.5,           # 1.0 / 2.0
        "objectness_loss": 2.0,     # 1.0 / 0.5
        "proposal_sem_cls_loss": 2.0,
        # heading_cls_loss: ref value 0.0 -> skipped (no ratio)
        # ref_only_loss: not logged by ours -> skipped
        # eval_loss: excluded by name
    }]


def test_ref_loop_counts_loss_exactly_once():
    """Every reference criterion writes end_points['loss'] (Votenet
    loss_helper.py:536, GF loss_helper.py:314, DA_jitter :796), which
    _accumulate picks up; the loop must not add the returned loss on
    top (the cr/groupfree recipes double-counted the logged 'loss'
    before 2026-08-18)."""
    import torch

    from backtoreality_tpu.tools.ref_loop import _accumulate_batch

    loss = torch.tensor(7.0)
    stat_sums = {}
    # criterion that writes end_points['loss'] (all reference criteria)
    _accumulate_batch(stat_sums, {"loss": loss, "vote_loss": 2.0}, loss)
    assert stat_sums["loss"] == 7.0
    assert stat_sums["vote_loss"] == 2.0
    # hypothetical criterion that does not: the returned loss still lands
    stat_sums = {}
    _accumulate_batch(stat_sums, {"vote_loss": 2.0}, loss)
    assert stat_sums["loss"] == 7.0


def test_parity_report_da_suffix_aliasing(tmp_path):
    """Ref DA/CR histories log source-domain components under plain
    names (ref_loop accumulates ep_S); our DA drivers log them with a
    _S suffix — the report must pair X_loss with X_loss_S."""
    ref_dir, ours_dir = tmp_path / "ref", tmp_path / "ours"
    ref_dir.mkdir()
    ours_dir.mkdir()
    (ref_dir / "history.jsonl").write_text(json.dumps(
        {"epoch": 0, "loss": 40.0, "vote_loss": 2.0,
         "jitter_loss": 0.5}))
    (ours_dir / "metrics.jsonl").write_text(json.dumps(
        {"step": 0, "loss": 38.0, "vote_loss_S": 1.0,
         "jitter_loss_S": 1.0}))
    report = parity_report.build_report(str(ref_dir), str(ours_dir))
    assert report["components"] == [
        {"epoch": 0, "vote_loss": 0.5, "jitter_loss": 2.0}]
