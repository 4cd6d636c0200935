#!/bin/bash
# Round-5 stage 6: Matterport-config rehearsal (verdict item 7 tail):
# 2 epochs + full 100-scan driver-path eval at MAX_NUM_OBJ=256 /
# 12 heading bins, to measure the 256-proposal-slot eval cost.
cd /root/repo
set -x
# end-of-round guard (see s5): don't start past 11:00Z
if [ "$(date -u +%s)" -ge 1787137200 ]; then
  echo "S6 MP REHEARSAL SKIPPED (past 11:00Z cutoff)"
  exit 0
fi
timeout 5400 python -m backtoreality_tpu.train.votenet_fsb \
  --dataset matterport_md40 \
  --data_root /tmp/mp_rehearsal/train --val_data_root /tmp/mp_rehearsal/val \
  --train_split all --val_split all \
  --num_point 40000 --fps_candidates 8192 --batch_size 8 --seed 0 \
  --max_epoch 2 --eval_freq 2 --guard_every_steps 0 \
  --log_dir /tmp/r5_mp_rehearsal_log
echo "S6 MP REHEARSAL rc=$?"
