"""CLI entry point: GroupFree3D WSB (mirrors train_GF_wsb.py)."""

from backtoreality_tpu.train.groupfree import main

if __name__ == "__main__":
    main("wsb")
