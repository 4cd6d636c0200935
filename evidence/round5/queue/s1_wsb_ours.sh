#!/bin/bash
# Round-5 stage 1: the WSB evidence pair's OURS leg (verdict item 4).
# Matched INIT: starts from the torch ref loop's own init checkpoint
# (imported), so the curves compare loop dynamics from an identical
# parameter point (stronger than round-3's matched-scheme protocol).
# Ref leg: tools/ref_loop --recipe wsb, same fixture/flags (running).
cd /root/repo
set -x
python -m backtoreality_tpu.tools.torch_import \
  /tmp/wsb_ref/init_checkpoint.tar --model votenet \
  --out /tmp/r5_wsb_init.tar || exit 1
timeout 3000 python -m backtoreality_tpu.train.votenet_wsb \
  --data_root /tmp/parity/train --val_data_root /tmp/parity/val \
  --train_split all --val_split all \
  --num_point 2500 --num_target 32 --batch_size 8 \
  --max_epoch 125 --eval_freq 25 --seed 0 \
  --query_mode exact --guard_every_steps 0 \
  --checkpoint_path /tmp/r5_wsb_init.tar \
  --log_dir /tmp/r5_wsb_ours
echo "S1 WSB OURS rc=$?"
