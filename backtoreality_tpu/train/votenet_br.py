"""CLI entry point: VoteNet BR (mirrors train_Votenet_br.py)."""

from backtoreality_tpu.train.votenet import main

if __name__ == "__main__":
    main("br")
