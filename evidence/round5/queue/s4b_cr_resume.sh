#!/bin/bash
# s4 follow-up: the s4 resume segment died at ep9 on a transient
# remote-compile tunnel error ("response body closed before all bytes
# were read"); resume to ep30 (retry once on another transient) and
# refresh the ep29 checkpoint copy for jitter_diag.
cd /root/repo
set -x
COMMON="--data_root /tmp/br/real --source_data_root /tmp/br/virtual \
  --val_data_root /tmp/br/val --train_split all --val_split all \
  --num_point 1500 --num_target 16 --batch_size 8 \
  --eval_freq 10 --seed 0 --center_jitter 0.5 \
  --query_mode exact --guard_every_steps 0 --log_dir /tmp/r5_cr_ours"
for attempt in 1 2; do
  timeout 3000 python -m backtoreality_tpu.train.votenet_br_center_refine \
    $COMMON --max_epoch 30 --resume
  rc=$?
  [ $rc -eq 0 ] && break
done
cp /tmp/r5_cr_ours/train_BR_CenterRefine.tar /tmp/r5_cr_ours/ckpt_ep29.tar
echo "S4B CR RESUME rc=$rc"
