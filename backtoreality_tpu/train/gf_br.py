"""CLI entry point: GroupFree3D BR (mirrors train_GF_br.py)."""

from backtoreality_tpu.train.groupfree import main

if __name__ == "__main__":
    main("br")
