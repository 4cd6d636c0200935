"""Run the REFERENCE's own VoteNet training loop (torch, CPU) on a
fixture directory — the system-level parity harness.

This drives the reference code itself: its `ScannetDetectionDataset`,
its `VoteNet`, its `get_loss`, its Adam + LR/BN schedules, and its
`APCalculator` eval, exactly as `train_Votenet_FSB.py:180-292` wires
them — with only the CUDA ops replaced by the exact-semantics CPU
stubs (`tests/torch_ext_stub.py`) and the dataset pointed at an
absolute fixture path. Training our driver on the SAME fixture and
comparing the loss/mAP curves converts "all unit parities pass" into
"the systems match"; the saved checkpoint (reference format,
`train_Votenet_FSB.py:300-312`) additionally round-trips through
`tools/torch_import.py` into our eval.

Usage:
  python -m backtoreality_tpu.tools.ref_loop \
      --data_root /path/to/fixture --log_dir log_ref \
      --num_point 2500 --num_target 32 --max_epoch 60 --eval_freq 10
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

REF = pathlib.Path("/root/reference/detection/Votenet")
REPO = pathlib.Path(__file__).resolve().parents[2]


def _import_reference():
    """Reference import recipe (same as the parity-test fixtures)."""
    import types

    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.FloatTensor = torch.FloatTensor
    ply = types.ModuleType("plyfile")
    ply.PlyData = object
    ply.PlyElement = object
    sys.modules.setdefault("plyfile", ply)
    sys.modules.setdefault("trimesh", types.ModuleType("trimesh"))
    try:
        import matplotlib

        matplotlib.use("Agg")
    except ImportError:
        pass
    sys.path.insert(0, str(REPO / "tests"))
    import torch_ext_stub

    torch_ext_stub.install()
    # purge modules a GroupFree import may have cached under the same
    # names (mirror of the parity-fixture hygiene)
    for name in ("backbone_module", "pointnet2_modules",
                 "pointnet2_utils", "pytorch_utils", "pc_util", "nms",
                 "box_util", "eval_det", "metric_util", "votenet",
                 "voting_module", "proposal_module", "loss_helper",
                 "ap_helper", "scannet_detection_dataset",
                 "model_util_scannet"):
        sys.modules.pop(name, None)
    for sub in ("pointnet2", "utils", "models", "scannet"):
        sys.path.insert(0, str(REF / sub))
    sys.path.insert(0, str(REF))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", required=True,
                        help="fixture dir with *_vert.npy quadruples")
    parser.add_argument("--val_data_root", default=None)
    parser.add_argument("--log_dir", required=True)
    parser.add_argument("--num_point", type=int, default=2500)
    parser.add_argument("--num_target", type=int, default=32)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--max_epoch", type=int, default=60)
    parser.add_argument("--eval_freq", type=int, default=10)
    parser.add_argument("--learning_rate", type=float, default=0.001)
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--bn_decay_step", type=int, default=20)
    parser.add_argument("--bn_decay_rate", type=float, default=0.5)
    parser.add_argument("--lr_decay_steps", default="80,120,160")
    parser.add_argument("--lr_decay_rates", default="0.1,0.1,0.1")
    parser.add_argument("--ap_iou_thresh", type=float, default=0.25)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--resume", action="store_true",
                        help="continue from <log_dir>/checkpoint.tar "
                        "(curve-level resume: data order reseeds)")
    args = parser.parse_args(argv)

    import torch
    from torch.utils.data import DataLoader

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)

    _import_reference()
    import importlib

    ds_mod = importlib.import_module("scannet_detection_dataset")
    cfg_mod = importlib.import_module("model_util_scannet")
    votenet_mod = importlib.import_module("votenet")
    ap_mod = importlib.import_module("ap_helper")
    putils = importlib.import_module("pytorch_utils")

    DC = cfg_mod.ScannetDatasetConfig_md40()
    train_ds = ds_mod.ScannetDetectionDataset(
        "all", os.path.abspath(args.data_root),
        num_points=args.num_point, augment=True, use_height=True)
    val_ds = ds_mod.ScannetDetectionDataset(
        "all", os.path.abspath(args.val_data_root or args.data_root),
        num_points=args.num_point, augment=False, use_height=True)
    train_loader = DataLoader(train_ds, batch_size=args.batch_size,
                              shuffle=True, num_workers=0,
                              drop_last=True)
    val_loader = DataLoader(val_ds, batch_size=args.batch_size,
                            shuffle=False, num_workers=0)

    net = votenet_mod.VoteNet(
        num_class=DC.num_class,
        num_heading_bin=DC.num_heading_bin,
        num_size_cluster=DC.num_size_cluster,
        mean_size_arr=DC.mean_size_arr,
        num_proposal=args.num_target,
        input_feature_dim=1,  # height (reference default: not no_height)
        vote_factor=1,
        sampling="vote_fps")
    criterion = votenet_mod.get_loss
    optimizer = torch.optim.Adam(net.parameters(),
                                 lr=args.learning_rate,
                                 weight_decay=args.weight_decay)

    lr_decay_steps = [int(x) for x in args.lr_decay_steps.split(",")]
    lr_decay_rates = [float(x) for x in args.lr_decay_rates.split(",")]

    log_dir = pathlib.Path(args.log_dir)
    start_epoch = 0
    if args.resume and (log_dir / "checkpoint.tar").exists():
        ckpt = torch.load(log_dir / "checkpoint.tar",
                          map_location="cpu", weights_only=False)
        net.load_state_dict(ckpt["model_state_dict"])
        optimizer.load_state_dict(ckpt["optimizer_state_dict"])
        start_epoch = int(ckpt["epoch"]) + 1
        print(f"resumed from epoch {ckpt['epoch']}", flush=True)

    # `train_Votenet_FSB.py:185-189`
    BN_MOMENTUM_INIT, BN_MOMENTUM_MAX = 0.5, 0.001
    bn_lbmd = lambda it: max(  # noqa: E731
        BN_MOMENTUM_INIT * args.bn_decay_rate
        ** (int(it / args.bn_decay_step)), BN_MOMENTUM_MAX)
    bnm_scheduler = putils.BNMomentumScheduler(net, bn_lambda=bn_lbmd,
                                               last_epoch=start_epoch - 1)

    def get_current_lr(epoch):  # `train_Votenet_FSB.py:192-197`
        lr = args.learning_rate
        for i, step in enumerate(lr_decay_steps):
            if epoch >= step:
                lr *= lr_decay_rates[i]
        return lr

    config_dict = {
        "remove_empty_box": False, "use_3d_nms": True, "nms_iou": 0.25,
        "use_old_type_nms": False, "cls_nms": True,
        "per_class_proposal": True, "conf_thresh": 0.05,
        "dataset_config": DC,
    }

    log_dir.mkdir(parents=True, exist_ok=True)
    history = open(log_dir / "history.jsonl",
                   "a" if start_epoch else "w")

    if not start_epoch:
        # save the INIT weights (reference checkpoint format): importing
        # them into our driver (--checkpoint_path, no --resume) starts
        # both systems from the identical parameter point, so the loss
        # curves compare loop dynamics instead of init schemes
        torch.save({
            "epoch": -1,
            "model_state_dict": net.state_dict(),
            "optimizer_state_dict": {},
            "loss": float("nan"),
        }, log_dir / "init_checkpoint.tar")

    for epoch in range(start_epoch, args.max_epoch):
        # ---- train_one_epoch (`train_Votenet_FSB.py:211-244`) ----
        for g in optimizer.param_groups:
            g["lr"] = get_current_lr(epoch)
        bnm_scheduler.step()
        net.train()
        losses = []
        t0 = time.time()
        for batch in train_loader:
            optimizer.zero_grad()
            end_points = net({"point_clouds": batch["point_clouds"]})
            for key in batch:
                assert key not in end_points
                end_points[key] = batch[key]
            loss, end_points = criterion(end_points, DC)
            loss.backward()
            optimizer.step()
            losses.append(float(loss.item()))
        rec = {"epoch": epoch, "loss": float(np.mean(losses)),
               "lr": get_current_lr(epoch),
               "secs": round(time.time() - t0, 1)}

        # ---- evaluate_one_epoch (`train_Votenet_FSB.py:246-292`) ----
        if (epoch + 1) % args.eval_freq == 0:
            ap_calc = ap_mod.APCalculator(
                ap_iou_thresh=args.ap_iou_thresh,
                class2type_map=DC.class2type)
            net.eval()
            eval_losses = []
            for batch in val_loader:
                with torch.no_grad():
                    end_points = net(
                        {"point_clouds": batch["point_clouds"]})
                for key in batch:
                    end_points[key] = batch[key]
                loss, end_points = criterion(end_points, DC)
                eval_losses.append(float(loss.item()))
                ap_calc.step(
                    ap_mod.parse_predictions(end_points, config_dict),
                    ap_mod.parse_groundtruths(end_points, config_dict))
            metrics = ap_calc.compute_metrics()
            rec["eval_loss"] = float(np.mean(eval_losses))
            rec["mAP"] = float(metrics["mAP"])
            rec["AR"] = float(metrics["AR"])

        history.write(json.dumps(rec) + "\n")
        history.flush()
        print(rec, flush=True)

        # reference checkpoint format (`train_Votenet_FSB.py:300-312`)
        torch.save({
            "epoch": epoch,
            "model_state_dict": net.state_dict(),
            "optimizer_state_dict": optimizer.state_dict(),
            "loss": rec["loss"],
        }, log_dir / "checkpoint.tar")

    history.close()


if __name__ == "__main__":
    main()
