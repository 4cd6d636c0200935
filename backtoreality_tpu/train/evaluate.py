"""Standalone evaluation entry point.

The reference has no eval script — evaluation only exists inside the
training drivers (`evaluate_one_epoch`, SURVEY.md §3.5). This exposes
it first-class: load a checkpoint, run the eval protocol over a split,
print per-class AP/AR at the requested IoU thresholds.

Usage:
  python -m backtoreality_tpu.train.evaluate --model votenet \
      --checkpoint_path log/checkpoint.tar --data_root data [...]
  python -m backtoreality_tpu.train.evaluate --model groupfree [...]
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp

from backtoreality_tpu.data import get_config
from backtoreality_tpu.data.dataset import DetectionDataset
from backtoreality_tpu.data.loader import DetectionDataLoader
from backtoreality_tpu.eval import (
    APCalculator,
    parse_groundtruths,
    parse_predictions,
)
from backtoreality_tpu.parallel import make_mesh, replicate, shard_batch
from backtoreality_tpu.train import common
from backtoreality_tpu.train import votenet as vn_driver
from backtoreality_tpu.train import groupfree as gf_driver


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", choices=["votenet", "groupfree"],
                        default="votenet")
    parser.add_argument("--eval_seeds", type=int, default=1,
                        help="repeat the eval under N different"
                             " point-subsample seeds and report"
                             " mean +/- sigma: on small val fixtures"
                             " the 2500-pt subsample draw alone moves"
                             " mAP@0.25 by ~+/-0.01-0.07 (RESULTS.md"
                             " eval-noise study), so single-draw"
                             " numbers overstate precision")
    if argv is None:
        import sys

        argv = sys.argv[1:]
    pre, rest = parser.parse_known_args(argv)

    if pre.model == "votenet":
        sub = argparse.ArgumentParser()
        vn_driver.add_common_flags(sub)
        sub.add_argument("--split", default="val")
        sub.add_argument("--kind", default="plain",
                         choices=["plain", "da", "da_jitter"],
                         help="model graph the checkpoint was trained"
                              " with (BR -> da, CenterRefine ->"
                              " da_jitter); eval protocol is identical")
        sub.add_argument("--train_data_root", default=None,
                         help="train split for BN recalibration"
                              " (--bn_recal_batches; required for"
                              " faithful --bf16 checkpoint eval: the"
                              " driver recalibrates stale BN stats"
                              " before every in-loop eval)")
        sub.add_argument("--recal_split", default="all")
        flags = sub.parse_args(rest)
        cfg = get_config(flags.dataset)
        model = vn_driver.build_model(flags, cfg, flags.kind)
        use_height = not flags.no_height
        num_point = flags.num_point
        thresholds = [flags.ap_iou_thresh, 0.5]
        eval_prefixes = ("",)
        conf_thresh = 0.05
    else:
        sub = argparse.ArgumentParser()
        gf_driver.add_flags(sub)
        sub.add_argument("--split", default="val")
        sub.add_argument("--train_data_root", default=None,
                         help="train split for BN recalibration"
                              " (--bn_recal_batches)")
        sub.add_argument("--recal_split", default="all")
        flags = sub.parse_args(rest)
        cfg = get_config(flags.dataset)
        model = gf_driver.build_model(flags, cfg)
        use_height = flags.use_height
        num_point = flags.num_point
        thresholds = flags.ap_iou_thresholds
        eval_prefixes = ("last_",) if flags.num_decoder_layers > 0 \
            else ("proposal_",)
        conf_thresh = 0.0

    assert flags.checkpoint_path, "--checkpoint_path is required"
    mesh = make_mesh(getattr(flags, "num_devices", None))
    ds = DetectionDataset(
        cfg, flags.data_root, split=flags.split, num_points=num_point,
        use_color=flags.use_color, use_height=use_height, augment=False,
        gf_labels=(pre.model == "groupfree"))
    loader = DetectionDataLoader(
        ds, flags.batch_size, shuffle=False, drop_last=False,
        num_shards=jax.process_count(),
        shard_index=jax.process_index())
    print(f"eval scans: {len(ds)}")

    jitter_args = getattr(flags, "kind", "plain") == "da_jitter"

    def _model_args(batch, n=None):
        sl = slice(None) if n is None else slice(0, n)
        args = (jnp.asarray(batch["point_clouds"][sl]),)
        if jitter_args:
            args += (jnp.asarray(batch["center_label"][sl]),
                     jnp.asarray(batch["sem_cls_label"][sl]))
        return args

    rng = jax.random.PRNGKey(0)
    sample = next(iter(loader))
    init_fn = jax.jit(functools.partial(model.init, train=False))
    variables = init_fn(rng, *_model_args(sample, 1))
    sd, epoch, _ = common.load_checkpoint(flags.checkpoint_path)
    params = common.partial_restore(
        jax.device_get(variables["params"]), sd["params"], log=print)
    batch_stats = common.partial_restore(
        jax.device_get(variables["batch_stats"]), sd["batch_stats"],
        log=print)
    print(f"loaded checkpoint from epoch {epoch}")
    variables = replicate(
        {"params": params, "batch_stats": batch_stats}, mesh)

    # BN recalibration (mirrors the drivers' pre-eval recal): bf16
    # weight drift past the BN-momentum floor staleness-shifts frozen
    # running stats, costing ~0.25 mAP on the 600-epoch fixture
    # (RESULTS.md precision policy); standalone eval of such a
    # checkpoint needs the same refresh from train-mode forwards.
    recal_batches = getattr(flags, "bn_recal_batches", None)
    explicit_recal = recal_batches is not None
    if recal_batches is None:
        recal_batches = 20 if getattr(flags, "bf16", False) else 0
    if recal_batches > 0 and not flags.train_data_root:
        if explicit_recal:
            # An explicit --bn_recal_batches without the data to do it
            # is a contradiction the user must resolve; silently
            # falling back to frozen stats costs ~0.25 mAP on bf16
            # checkpoints (RESULTS.md precision policy).
            raise SystemExit(
                "--bn_recal_batches > 0 requires --train_data_root"
                " (recalibration draws train-mode batches)")
        print("warning: BN recalibration implied by --bf16 but no"
              " --train_data_root given; evaluating with the"
              " checkpoint's frozen BN stats")
    elif recal_batches > 0:
        recal_ds = DetectionDataset(
            cfg, flags.train_data_root, split=flags.recal_split,
            num_points=num_point, use_color=flags.use_color,
            use_height=use_height, augment=True,
            gf_labels=(pre.model == "groupfree"))
        recal_loader = DetectionDataLoader(
            recal_ds, flags.batch_size, shuffle=True, drop_last=True,
            num_shards=jax.process_count(),
            shard_index=jax.process_index())
        bnm = jnp.asarray(0.2, jnp.float32)
        drop_key = jax.random.PRNGKey(0)

        @jax.jit
        def recal(variables, *args):
            if pre.model == "groupfree":
                _, mut = model.apply(
                    variables, *args, train=True, bn_momentum=bnm,
                    mutable=["batch_stats"],
                    rngs={"dropout": drop_key})
            else:
                _, mut = model.apply(
                    variables, *args, None, train=True,
                    bn_momentum=bnm, mutable=["batch_stats"])
            return mut["batch_stats"]

        done = 0
        recal_keys = ["point_clouds"] + (
            ["center_label", "sem_cls_label"] if jitter_args else [])
        if len(recal_loader) == 0:
            # drop_last=True with fewer scans than batch_size yields an
            # empty loader; the while-loop below would spin forever.
            raise SystemExit(
                f"BN recalibration loader is empty: {flags.train_data_root}"
                f" split={flags.recal_split} has {len(recal_ds)} scans"
                f" < batch_size {flags.batch_size}")
        while done < recal_batches:
            for batch in recal_loader:
                dev = shard_batch(
                    {k: batch[k] for k in recal_keys}, mesh)
                variables = {
                    "params": variables["params"],
                    "batch_stats": recal(
                        variables, *(dev[k] for k in recal_keys))}
                done += 1
                if done >= recal_batches:
                    break
        print(f"recalibrated BN stats over {done} train batches")

    @jax.jit
    def forward(variables, *args):
        return model.apply(variables, *args, train=False)

    config_dict = dict(
        remove_empty_box=False, use_3d_nms=True, nms_iou=0.25,
        use_old_type_nms=False, cls_nms=True, per_class_proposal=True,
        conf_thresh=conf_thresh, dataset_config=cfg)
    base_seed = ds.seed
    history = {(p, t): [] for p in eval_prefixes for t in thresholds}
    for si in range(max(1, pre.eval_seeds)):
        # a different dataset seed redraws every scan's point subsample
        # (and nothing else: augment=False); the jitted forward and the
        # RAM-cached raw scans are reused across passes
        ds.seed = base_seed + si
        calcs = {(p, t): APCalculator(t, cfg.class2type)
                 for p in eval_prefixes for t in thresholds}
        for batch in loader:
            keys = ["point_clouds"] + (
                ["center_label", "sem_cls_label"] if jitter_args else [])
            dev = shard_batch({k: batch[k] for k in keys}, mesh)
            outs = jax.device_get(
                forward(variables, *(dev[k] for k in keys)))
            gts = parse_groundtruths(batch, config_dict)
            for prefix in eval_prefixes:
                preds = parse_predictions(outs, config_dict, prefix)
                for t in thresholds:
                    calcs[(prefix, t)].step(preds, gts)
        for key, calc in calcs.items():
            history[key].append(calc.compute_metrics())

    import numpy as np

    for (prefix, t), runs in history.items():
        metrics = runs[0]
        print(f"===== {prefix or 'votenet'} @ IoU {t} =====")
        if len(runs) == 1:
            for key in sorted(metrics):
                print(f"  {key}: {metrics[key]:.4f}")
        else:
            for key in ("mAP", "AR"):
                vals = np.asarray([r[key] for r in runs])
                draws = " ".join(f"{v:.4f}" for v in vals)
                print(f"  {key}: {vals.mean():.4f} +/- "
                      f"{vals.std(ddof=1):.4f}  (seeds: {draws})")
            for key in sorted(runs[0]):
                if key in ("mAP", "AR"):
                    continue
                vals = np.asarray([r[key] for r in runs])
                print(f"  {key}: {vals.mean():.4f} +/- "
                      f"{vals.std(ddof=1):.4f}")


if __name__ == "__main__":
    main()
