"""CLI entry point: VoteNet FSB (mirrors train_Votenet_fsb.py)."""

from backtoreality_tpu.train.votenet import main

if __name__ == "__main__":
    main("fsb")
