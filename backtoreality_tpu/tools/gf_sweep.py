"""GF subset-FPS quality sweep: exact FPS vs --fps_candidates K,
multiple seeds each, in ONE process so each graph compiles once.

Settles the round-2 open question (exact 0.5195 vs K=8192 0.4736
mAP@0.25, n=1 each): with >=3 seeds per arm the gap is either real
(then subset-FPS stays not-recommended for GF) or run variance (then
GF gets the ~5 ms/step saving too). Writes one JSON line per run to
<out>/sweep.jsonl.

Usage:
  python -m backtoreality_tpu.tools.gf_sweep --data_root /tmp/qfix/train \
      --val_data_root /tmp/qfix/val --out /tmp/gf_sweep \
      --seeds 0 1 2 --candidates 8192 --max_epoch 300
"""

from __future__ import annotations

import argparse
import json
import pathlib
import time

import numpy as np

import jax
import jax.numpy as jnp


def run_config(flags, fps_candidates, seeds, out_path, logger):
    from backtoreality_tpu.data import get_config
    from backtoreality_tpu.data.dataset import DetectionDataset
    from backtoreality_tpu.data.loader import DetectionDataLoader
    from backtoreality_tpu.losses import groupfree as gf_losses
    from backtoreality_tpu.parallel import make_mesh, replicate
    from backtoreality_tpu.train import common
    from backtoreality_tpu.train import groupfree as gf

    cfg = get_config(flags.dataset)
    mesh = make_mesh(flags.num_devices)
    flags.fps_candidates = fps_candidates
    model = gf.build_model(flags, cfg)
    loss_kwargs = gf._loss_kwargs(flags)

    train_ds = DetectionDataset(
        cfg, flags.data_root, split="all", num_points=flags.num_point,
        use_height=flags.use_height, augment=True, gf_labels=True,
        seed=0)
    val_ds = DetectionDataset(
        cfg, flags.val_data_root, split="all",
        num_points=flags.num_point, use_height=flags.use_height,
        augment=False, gf_labels=True, seed=0)

    steps_per_epoch = len(train_ds) // flags.batch_size
    main_sched = common.make_gf_schedule(flags.learning_rate, flags,
                                         steps_per_epoch)
    dec_sched = common.make_gf_schedule(flags.decoder_learning_rate,
                                        flags, steps_per_epoch)
    optimizer = common.make_gf_optimizer(
        main_sched, dec_sched, flags.weight_decay, flags.clip_norm)

    # ONE jitted step per config, reused across all seeds (fresh state
    # per seed re-enters the same compiled executable: same shapes)
    train_step = gf.make_train_step(model, optimizer,
                                    gf_losses.get_loss, cfg,
                                    loss_kwargs)
    eval_step = gf.make_eval_step(model, gf_losses.get_loss, cfg,
                                  loss_kwargs, ("last_",))

    results = []
    for seed in seeds:
        rng = jax.random.PRNGKey(seed)
        train_loader = DetectionDataLoader(train_ds, flags.batch_size,
                                           seed=seed)
        val_loader = DetectionDataLoader(val_ds, flags.batch_size,
                                         shuffle=False,
                                         drop_last=False)
        sample = next(iter(train_loader))
        state = gf.init_state(
            model, optimizer,
            (jnp.asarray(sample["point_clouds"][:1]),), rng)
        state = replicate(state, mesh)

        from backtoreality_tpu.parallel import shard_batch

        t0 = time.time()
        for epoch in range(flags.max_epoch):
            train_loader.set_epoch(epoch)
            aux_hist = []
            for batch in train_loader:
                state, aux = train_step(
                    state, shard_batch(batch, mesh), rng,
                    np.float32(flags.bn_momentum))
                aux_hist.append(aux)
            if (epoch + 1) % 100 == 0:
                means = common.fetch_aux_means(aux_hist)
                logger(f"cand={fps_candidates} seed={seed} "
                       f"epoch={epoch} loss={means.get('loss'):.4f} "
                       f"({time.time() - t0:.0f}s)")
        metrics, _ = gf.evaluate(
            state, val_loader, eval_step, cfg, mesh, None, flags,
            prefixes=("last_",))
        rec = {
            "fps_candidates": fps_candidates,
            "seed": seed,
            "mAP@0.25": float(metrics[("last_", 0.25)]["mAP"]),
            "AR@0.25": float(metrics[("last_", 0.25)]["AR"]),
            "mAP@0.50": float(metrics[("last_", 0.5)]["mAP"]),
            "AR@0.50": float(metrics[("last_", 0.5)]["AR"]),
            "train_secs": round(time.time() - t0, 1),
        }
        logger(json.dumps(rec))
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        results.append(rec)
    return results


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", required=True)
    parser.add_argument("--val_data_root", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--seeds", type=int, nargs="+",
                        default=[0, 1, 2])
    parser.add_argument("--candidates", type=int, nargs="+",
                        default=[8192],
                        help="subset-FPS K arms (exact FPS always runs)")
    parser.add_argument("--skip_exact", action="store_true")
    parser.add_argument("--max_epoch", type=int, default=300)
    parser.add_argument("--num_point", type=int, default=20000)
    parser.add_argument("--num_target", type=int, default=256)
    parser.add_argument("--num_decoder_layers", type=int, default=2)
    parser.add_argument("--batch_size", type=int, default=8)
    args = parser.parse_args(argv)

    from backtoreality_tpu.train import groupfree as gf

    # driver-default flags, overridden by the sweep args
    dflags = argparse.ArgumentParser()
    gf.add_flags(dflags)
    flags = dflags.parse_args([
        "--data_root", args.data_root,
        "--num_point", str(args.num_point),
        "--num_target", str(args.num_target),
        "--num_decoder_layers", str(args.num_decoder_layers),
        "--batch_size", str(args.batch_size),
        "--max_epoch", str(args.max_epoch),
        "--lr_decay_epochs",
        str(int(args.max_epoch * 0.7)), str(int(args.max_epoch * 0.87)),
    ])
    flags.val_data_root = args.val_data_root

    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / "sweep.jsonl"

    def logger(msg):
        print(msg, flush=True)

    arms = ([] if args.skip_exact else [None]) + list(args.candidates)
    for cand in arms:
        run_config(flags, cand, args.seeds, out_path, logger)


if __name__ == "__main__":
    main()
