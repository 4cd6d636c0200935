#!/bin/bash
# Round-5 CPU (torch reference) chain — the expensive legs of the
# system-parity pairs. Runs nice'd so TPU-client dispatch on the
# 1-core host always wins; intentionally NOT under the TPU flock
# (training legs tolerate contention; bench/dryrun captures do not,
# and the chain is scheduled to finish before end-of-round captures).
cd /root/repo
set -x
# 1. wait for the in-flight WSB ref leg (125 epochs) to exit
while kill -0 "$(cat /tmp/wsb_ref.pid 2>/dev/null)" 2>/dev/null; do
  sleep 120
done

# 2. BR ref leg: 30 epochs, benchmark jitter 0.1 (pairs with s3)
nice -n 19 timeout 10800 python -m backtoreality_tpu.tools.ref_loop \
  --model votenet --recipe br \
  --data_root /tmp/br/real --source_data_root /tmp/br/virtual \
  --val_data_root /tmp/br/val --log_dir /tmp/r5_br_ref \
  --num_point 1500 --num_target 16 --batch_size 8 \
  --max_epoch 30 --eval_freq 10 --seed 0 --center_jitter 0.1 \
  > /tmp/r5_br_ref.out 2>&1
echo "CPU BR REF rc=$? $(date -u)"

# 3. CR ref leg: 30 epochs, 5x jitter (pairs with s4); two segments
#    so the ep-7 checkpoint survives for jitter_diag
CRC="--model votenet --recipe cr \
  --data_root /tmp/br/real --source_data_root /tmp/br/virtual \
  --val_data_root /tmp/br/val --log_dir /tmp/r5_cr_ref \
  --num_point 1500 --num_target 16 --batch_size 8 \
  --eval_freq 10 --seed 0 --center_jitter 0.5"
nice -n 19 timeout 7200 python -m backtoreality_tpu.tools.ref_loop \
  $CRC --max_epoch 8 > /tmp/r5_cr_ref.out 2>&1
cp /tmp/r5_cr_ref/checkpoint.tar /tmp/r5_cr_ref/ckpt_ep7.tar
nice -n 19 timeout 10800 python -m backtoreality_tpu.tools.ref_loop \
  $CRC --max_epoch 30 --resume >> /tmp/r5_cr_ref.out 2>&1
rc=$?
cp /tmp/r5_cr_ref/checkpoint.tar /tmp/r5_cr_ref/ckpt_ep29.tar
echo "CPU CR REF rc=$rc $(date -u)"

# 4. GF FSB ref leg, fresh (round-4 pair lost to /tmp cleanup):
#    round-4 recipe — parity fixture, 2 decoder layers, dim_ff 128,
#    dual-LR 4e-3/4e-4, 125-epoch schedule. Runs until the round's
#    time box; per-epoch checkpoint + history survive a kill.
nice -n 19 timeout 18000 python -m backtoreality_tpu.tools.ref_loop \
  --model groupfree --data_root /tmp/parity/train \
  --val_data_root /tmp/parity/val --log_dir /tmp/r5_gf_ref \
  --num_point 2500 --num_target 32 --batch_size 8 \
  --max_epoch 125 --eval_freq 25 --seed 0 --learning_rate 0.004 \
  --num_decoder_layers 2 --dim_feedforward 128 \
  > /tmp/r5_gf_ref.out 2>&1
echo "CPU GF REF rc=$? $(date -u)"
echo "CPU CHAIN DONE $(date -u)"
