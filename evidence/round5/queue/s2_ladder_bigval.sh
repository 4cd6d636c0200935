#!/bin/bash
# Round-5 stage 2: 100-scan multi-seed confirmation of the bf16 ladder
# (verdict item 1 "CONFIRM on the 100-scan val"). Evaluates all four
# round-4 ladder arm checkpoints on the shapefix 100-scan val (seed 32
# family, /tmp/shapefix_bigval regenerable via
#   parity_fixture --kind shapefix --val_scans 100)
# with 3 subsample seeds; bf16 arms recalibrate BN from the train
# split first (20 batches), mirroring the in-loop eval protocol.
cd /root/repo
set -x
COMMON="--data_root /tmp/shapefix_bigval/val --split all \
  --num_point 20000 --fps_candidates 8192 --num_target 256 \
  --batch_size 8 --eval_seeds 3"
ev() {
  name=$1; shift
  timeout 3000 python -m backtoreality_tpu.train.evaluate \
    --model votenet $COMMON \
    --checkpoint_path /tmp/lad_$name/checkpoint.tar "$@" \
    > /tmp/r5_ladeval_$name.out 2>&1
  echo "=== ladeval $name rc=$? ==="
}
ev f32
ev t1 --bf16 --f32_tail 1 --train_data_root /tmp/shapefix/train --recal_split all
ev t2 --bf16 --f32_tail 2 --train_data_root /tmp/shapefix/train --recal_split all
ev t4 --bf16 --f32_tail 4 --train_data_root /tmp/shapefix/train --recal_split all
echo "S2 LADEVAL DONE $(date -u)"
