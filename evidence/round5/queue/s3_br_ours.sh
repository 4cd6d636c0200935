#!/bin/bash
# Round-5 stage 3: BR system-parity pair, OURS leg (verdict item 4).
# Fixture: parity_fixture --kind br (real seed 21 / val 22 / virtual
# seed 23), benchmark center_jitter 0.1, N=1500 K=16 (the round-4 CR
# study's scale). Ref leg: ref_loop --recipe br, same fixture/flags.
cd /root/repo
set -x
timeout 3000 python -m backtoreality_tpu.train.votenet_br \
  --data_root /tmp/br/real --source_data_root /tmp/br/virtual \
  --val_data_root /tmp/br/val --train_split all --val_split all \
  --num_point 1500 --num_target 16 --batch_size 8 \
  --max_epoch 30 --eval_freq 10 --seed 0 --center_jitter 0.1 \
  --query_mode exact --guard_every_steps 0 \
  --log_dir /tmp/r5_br_ours
echo "S3 BR OURS rc=$?"
