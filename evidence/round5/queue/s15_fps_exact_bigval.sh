#!/bin/bash
# Round-5 stage 15 (opportunistic): exact-FPS eval of the f32 ladder
# checkpoint on the 100-scan val — the n=100 re-statement of the
# round-3 "subset-FPS (K=8192) is quality-equivalent" claim on the
# eval side. Subset-FPS counterpart already measured by s2:
# 0.8210 +/- 0.0064 mAP@0.25 (r5_ladeval_f32.out).
cd /root/repo
set -x
if [ "$(date -u +%s)" -ge 1787139000 ]; then
  echo "S15 SKIPPED (past 11:30Z)"
  exit 0
fi
timeout 1800 python -m backtoreality_tpu.train.evaluate \
  --model votenet --data_root /tmp/shapefix_bigval/val --split all \
  --num_point 20000 --num_target 256 --batch_size 8 --eval_seeds 3 \
  --checkpoint_path /tmp/lad_f32/checkpoint.tar \
  > /tmp/r5_fpsexact_eval.out 2>&1
echo "S15 FPS EXACT rc=$? $(date -u)"
