#!/bin/bash
# Round-5 stage 11: WSB pair scored at n=100, BOTH sides (verdict
# item 6's "ours AND imported ref checkpoints" clause). The 12-scan
# in-loop evals of the 125-epoch WSB pair ended at ours 0.028 / ref
# 0.071 mAP@0.25 — magnitudes the 12-scan noise band spans. Score
# both final checkpoints on the 100-scan parity val (seed 43,
# parity_fixture --kind parity --val_scans 100 --val_seed 43) with 3
# subsample seeds. Ref checkpoint imported via torch_import (exact
# grouping, per the import note).
cd /root/repo
set -x
# per-step end-of-round guards (see s10): each ~10-min eval may start
# up to 11:30Z so the lock is free well before the driver's captures
COMMON="--model votenet --data_root /tmp/parity_bigval/val --split all \
  --num_point 2500 --num_target 32 --batch_size 8 --eval_seeds 3 \
  --query_mode exact"
if [ "$(date -u +%s)" -ge 1787139000 ]; then
  echo "=== wsb bigval ours SKIPPED (past 11:30Z) ==="
else
  timeout 1800 python -m backtoreality_tpu.train.evaluate $COMMON \
    --checkpoint_path /tmp/r5_wsb_ours/checkpoint.tar \
    > /tmp/r5_wsbeval_ours.out 2>&1
  echo "=== wsb bigval ours rc=$? ==="
fi
if [ "$(date -u +%s)" -ge 1787139000 ]; then
  echo "=== wsb bigval ref SKIPPED (past 11:30Z) ==="
else
  timeout 1800 python -m backtoreality_tpu.train.evaluate $COMMON \
    --checkpoint_path /tmp/wsb_ref_imported.tar \
    > /tmp/r5_wsbeval_ref.out 2>&1
  echo "=== wsb bigval ref rc=$? ==="
fi
echo "S11 WSB BIGVAL DONE $(date -u)"
