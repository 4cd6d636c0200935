"""CLI entry point: VoteNet BR_CENTER_REFINE (mirrors train_Votenet_br_center_refine.py)."""

from backtoreality_tpu.train.votenet import main

if __name__ == "__main__":
    main("br_center_refine")
