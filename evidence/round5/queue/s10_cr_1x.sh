#!/bin/bash
# Round-5 stage 10: CenterRefine at the BENCHMARK operating point
# (center_jitter 0.1 — the reference's intended error scale, vs the
# 5x stress studies). Grafts the s3 BR-at-1x checkpoint
# (/tmp/r5_br_ours/train_BR.tar) exactly like the reference grafts
# train_BR.tar (`train_Votenet_BR_CenterRefine.py` pretrain load),
# trains 30 epochs at lr 3e-4, then asks jitter_diag whether the
# jitter head recovers 1x error where it demonstrably failed at 5x.
cd /root/repo
set -x
# per-step end-of-round guards: never hold the lock into the driver's
# bench/dryrun captures. The 2400s train leg must START by 10:50Z so
# it ENDS by 11:30Z; each 1200s diag must start by 11:40Z.
if [ "$(date -u +%s)" -ge 1787136600 ]; then
  echo "S10 CR 1X SKIPPED (past 10:50Z cutoff)"
  exit 0
fi
timeout 2400 python -m backtoreality_tpu.train.votenet_br_center_refine \
  --data_root /tmp/br/real --source_data_root /tmp/br/virtual \
  --val_data_root /tmp/br/val --train_split all --val_split all \
  --num_point 1500 --num_target 16 --batch_size 8 \
  --max_epoch 30 --eval_freq 10 --seed 0 --center_jitter 0.1 \
  --query_mode exact --guard_every_steps 0 \
  --learning_rate 0.0003 \
  --checkpoint_path /tmp/r5_br_ours/train_BR.tar \
  --log_dir /tmp/r5_cr1x_ours
rc=$?
echo "S10 CR 1X TRAIN rc=$rc"
for dom in real virtual; do
  if [ "$(date -u +%s)" -ge 1787139600 ]; then
    echo "=== cr1x diag $dom SKIPPED (past 11:40Z) ==="
    continue
  fi
  timeout 1200 python -m backtoreality_tpu.tools.jitter_diag \
    --ckpt /tmp/r5_cr1x_ours/train_BR_CenterRefine.tar \
    --config /tmp/r5_cr1x_ours/config.json \
    --data_root /tmp/br/$dom > /tmp/r5_cr1x_diag_$dom.out 2>&1
  echo "=== cr1x diag $dom rc=$? ==="
done
echo "S10 CR 1X DONE $(date -u)"
