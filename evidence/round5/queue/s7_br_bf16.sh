#!/bin/bash
# Round-5 stage 7: BR under bf16 (verdict item 8): short-horizon BR
# pair f32 vs bf16/f32_tail-2 — checks the DA losses (focal terms,
# discriminators) are precision-stable before recommending bf16 for
# the weak/DA recipes.
cd /root/repo
set -x
# end-of-round guard (see s5): don't start past 11:00Z
if [ "$(date -u +%s)" -ge 1787137200 ]; then
  echo "S7 BR BF16 SKIPPED (past 11:00Z cutoff)"
  exit 0
fi
COMMON="--data_root /tmp/br/real --source_data_root /tmp/br/virtual \
  --val_data_root /tmp/br/val --train_split all --val_split all \
  --num_point 1500 --num_target 16 --batch_size 8 \
  --max_epoch 30 --eval_freq 10 --seed 0 --center_jitter 0.1 \
  --guard_every_steps 0"
timeout 3000 python -m backtoreality_tpu.train.votenet_br \
  $COMMON --log_dir /tmp/r5_brp_f32
rc1=$?
timeout 3000 python -m backtoreality_tpu.train.votenet_br \
  $COMMON --bf16 --f32_tail 2 --log_dir /tmp/r5_brp_bf16
rc2=$?
echo "S7 BR BF16 rc=$rc1/$rc2"
