#!/bin/bash
# Round-5 stage 8: GF FSB parity pair OURS leg (fresh 125-epoch run;
# the round-4 pair was lost to /tmp cleanup at ep24). Round-4 recipe:
# parity fixture, N=2500, K=32, batch 8, 2 decoder layers dim_ff 128,
# exact query mode, 125-epoch schedule. Ref leg: cpu_chain step 4.
cd /root/repo
set -x
timeout 3600 python -m backtoreality_tpu.train.gf_fsb \
  --data_root /tmp/parity/train --val_data_root /tmp/parity/val \
  --train_split all --val_split all \
  --num_point 2500 --num_target 32 --batch_size 8 \
  --num_decoder_layers 2 --dim_feedforward 128 --use_height \
  --max_epoch 125 --val_freq 25 --rng_seed 0 \
  --query_mode exact --guard_every_steps 0 \
  --log_dir /tmp/r5_gf_ours
echo "S8 GF OURS rc=$?"
