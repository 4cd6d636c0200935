#!/bin/bash
# Round-5 stage 5: GroupFree3D precision arms (verdict item 8's GF
# counterpart; round-3/4 bf16 quality studies were VoteNet-only).
# f32 control + bf16/f32_tail-2 on the shapefix fixture, 300-epoch GF
# recipe, evals every 50 epochs (same plan as the round-4 queue's
# stage 5 that never ran).
cd /root/repo
set -x
COMMON="--data_root /tmp/shapefix/train --val_data_root /tmp/shapefix/val \
  --train_split all --val_split all \
  --num_point 20000 --fps_candidates 8192 --num_decoder_layers 6 \
  --max_epoch 300 --val_freq 50 --lr_decay_epochs 210 260 \
  --batch_size 8 --rng_seed 0 --guard_every_steps 0 --use_height"
run() {
  name=$1; shift
  # end-of-round guard: never START an arm so late it could still be
  # holding the TPU flock when the driver's bench/dryrun captures run
  # (round-4 lesson: self-contention degraded the artifacts of record)
  if [ "$(date -u +%s)" -ge 1787136600 ]; then
    echo "=== gf arm $name SKIPPED (past 10:50Z cutoff) ==="
    return
  fi
  timeout 5400 python -m backtoreality_tpu.train.gf_fsb \
    $COMMON --log_dir /tmp/r5_gflad_$name "$@" > /tmp/r5_gflad_$name.out 2>&1
  echo "=== gf arm $name rc=$? ==="
}
run f32
run t2 --bf16 --f32_tail 2
echo "S5 GF PRECISION DONE $(date -u)"
