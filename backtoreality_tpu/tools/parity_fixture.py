"""Regenerate the round-3/4 evidence fixtures (RESULTS.md studies).

Every quality/parity study in RESULTS.md trains on one of three
synthetic fixtures; this tool regenerates each bit-for-bit (seeded):

  --kind parity    System-level training parity (ref torch loop vs our
                   driver): 40 train / 12 val scans, seeds 41/42.
  --kind br        BR/CenterRefine two-domain study: target ("real")
                   train+val seeds 21/22 and a distribution-shifted
                   source ("virtual", scene_aug names) seed 23. Use
                   with drivers' `--center_jitter` to inject the
                   annotation error under study.
  --kind qfix      The 600-epoch quality-fixture (FSB/GF end-to-end
                   studies + gf_sweep): 40/12 scans, seeds 11/12.
  --kind shapefix  bf16-precision study fixture: classes differ by
                   SHAPE (rich procedural library, 22 families,
                   rng 7), seeds 31/32 — classification quality is
                   geometry-driven instead of box-dims-driven.

Usage:
  python -m backtoreality_tpu.tools.parity_fixture --kind parity \
      --out /tmp/parity
"""

from __future__ import annotations

import argparse

import jax


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--kind", default="parity",
                        choices=["parity", "br", "qfix", "shapefix"])
    parser.add_argument("--out", default=None,
                        help="output root (default /tmp/<kind>)")
    parser.add_argument("--train_scans", type=int, default=40)
    parser.add_argument("--val_scans", type=int, default=12)
    parser.add_argument("--val_seed", type=int, default=None,
                        help="override the kind's val seed (e.g. a"
                             " fresh 100-scan val split for"
                             " eval-noise-reduced studies; RESULTS.md"
                             " bigval splits use 43 (parity) / 24"
                             " (br))")
    args = parser.parse_args(argv)
    out = args.out or f"/tmp/{args.kind}"

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.data.synthetic import write_synthetic_scans

    cfg = scannet_md40_config()
    kw = dict(num_objects=6, points_per_object=1200, floor_points=6000)

    if args.kind in ("parity", "qfix"):
        tr, va = (41, 42) if args.kind == "parity" else (11, 12)
        va = args.val_seed if args.val_seed is not None else va
        write_synthetic_scans(f"{out}/train", cfg,
                              num_scans=args.train_scans, seed=tr, **kw)
        write_synthetic_scans(f"{out}/val", cfg,
                              num_scans=args.val_scans, seed=va, **kw)
        parts = ["train", "val"]
    elif args.kind == "br":
        write_synthetic_scans(f"{out}/real", cfg,
                              num_scans=args.train_scans, seed=21, **kw)
        write_synthetic_scans(f"{out}/val", cfg,
                              num_scans=args.val_scans,
                              seed=(args.val_seed
                                    if args.val_seed is not None
                                    else 22), **kw)
        # source domain: full labels, shifted distribution (different
        # seed + object count); names carry "aug" for train_aug splits
        write_synthetic_scans(f"{out}/virtual", cfg,
                              num_scans=args.train_scans, num_objects=8,
                              points_per_object=1000, floor_points=5000,
                              seed=23, prefix="scene_aug")
        # the reference parses aug scan names as the first 18 chars
        # (`scannet_detection_dataset.py:69`, names like
        # scene_augXXXX_YY_k); pad ours to that convention so the
        # torch ref loop can consume the same fixture
        import pathlib as _pl

        for f in _pl.Path(f"{out}/virtual").glob("scene_aug*.npy"):
            stem16, suffix = f.name[:16], f.name[16:]
            if not suffix.startswith("_1"):
                f.rename(f.with_name(stem16 + "_1" + suffix))
        parts = ["real", "val", "virtual"]
    else:  # shapefix
        from backtoreality_tpu.datagen.library import (
            rich_procedural_library,
        )

        lib = rich_procedural_library(num_families=22,
                                      rng=np.random.default_rng(7))
        write_synthetic_scans(f"{out}/train", cfg,
                              num_scans=args.train_scans, seed=31,
                              shape_library=lib, **kw)
        write_synthetic_scans(f"{out}/val", cfg,
                              num_scans=args.val_scans,
                              seed=(args.val_seed
                                    if args.val_seed is not None
                                    else 32),
                              shape_library=lib, **kw)
        parts = ["train", "val"]

    print(f"{args.kind} fixture ready: " + ", ".join(
        f"{out}/{p}" for p in parts))


if __name__ == "__main__":
    main()
