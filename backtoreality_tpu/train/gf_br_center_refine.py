"""CLI entry point: GroupFree3D BR_CENTER_REFINE (mirrors train_GF_br_center_refine.py)."""

from backtoreality_tpu.train.groupfree import main

if __name__ == "__main__":
    main("br_center_refine")
