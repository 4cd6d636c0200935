#!/bin/bash
# Round-5 stage 4: CR pair re-run to schedule end, OURS leg (verdict
# item 5; the round-4 pair was lost to /tmp cleanup at ep14/30).
# Same recipe as round 4: kind-br fixture, center_jitter 0.5 (5x
# error study), N=1500 K=16, 30 epochs, from scratch. Two segments so
# checkpoints survive at the diag epochs (7, 29) for jitter_diag.
cd /root/repo
set -x
COMMON="--data_root /tmp/br/real --source_data_root /tmp/br/virtual \
  --val_data_root /tmp/br/val --train_split all --val_split all \
  --num_point 1500 --num_target 16 --batch_size 8 \
  --eval_freq 10 --seed 0 --center_jitter 0.5 \
  --query_mode exact --guard_every_steps 0 --log_dir /tmp/r5_cr_ours"
timeout 3000 python -m backtoreality_tpu.train.votenet_br_center_refine \
  $COMMON --max_epoch 8
rc1=$?
cp /tmp/r5_cr_ours/train_BR_CenterRefine.tar /tmp/r5_cr_ours/ckpt_ep7.tar
timeout 3000 python -m backtoreality_tpu.train.votenet_br_center_refine \
  $COMMON --max_epoch 30 --resume
rc2=$?
cp /tmp/r5_cr_ours/train_BR_CenterRefine.tar /tmp/r5_cr_ours/ckpt_ep29.tar
echo "S4 CR OURS rc=$rc1/$rc2"
