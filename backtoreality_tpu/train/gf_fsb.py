"""CLI entry point: GroupFree3D FSB (mirrors train_GF_fsb.py)."""

from backtoreality_tpu.train.groupfree import main

if __name__ == "__main__":
    main("fsb")
