"""Regenerate the system-level parity fixture (RESULTS.md §System-level
training parity): 40 train / 12 val synthetic scans, seeds 41/42 —
the exact data both the reference torch loop (`tools/ref_loop.py`) and
our driver were trained on for the round-3 parity study.

Usage:
  python -m backtoreality_tpu.tools.parity_fixture --out /tmp/parity
"""

from __future__ import annotations

import argparse

import jax


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/parity")
    parser.add_argument("--train_scans", type=int, default=40)
    parser.add_argument("--val_scans", type=int, default=12)
    args = parser.parse_args(argv)

    jax.config.update("jax_platforms", "cpu")
    from backtoreality_tpu.data import scannet_md40_config
    from backtoreality_tpu.data.synthetic import write_synthetic_scans

    cfg = scannet_md40_config()
    write_synthetic_scans(
        f"{args.out}/train", cfg, num_scans=args.train_scans,
        num_objects=6, points_per_object=1200, floor_points=6000,
        seed=41)
    write_synthetic_scans(
        f"{args.out}/val", cfg, num_scans=args.val_scans,
        num_objects=6, points_per_object=1200, floor_points=6000,
        seed=42)
    print(f"parity fixture ready: {args.out}/train "
          f"({args.train_scans} scans), {args.out}/val "
          f"({args.val_scans} scans)")


if __name__ == "__main__":
    main()
