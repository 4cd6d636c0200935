"""CLI entry point: VoteNet WSB (mirrors train_Votenet_wsb.py)."""

from backtoreality_tpu.train.votenet import main

if __name__ == "__main__":
    main("wsb")
