#!/bin/bash
# Round-5 stage 12 (opportunistic): 100-scan multi-seed evals of the
# two GF precision arms (s5) — the GroupFree counterpart of the s2
# VoteNet bf16 confirmation, on the same held-out shapefix 100-scan
# val (seed 33 family). The bf16 arm recalibrates BN from the train
# split first, mirroring the in-loop protocol.
cd /root/repo
set -x
COMMON="--model groupfree --data_root /tmp/shapefix_bigval/val --split all \
  --num_point 20000 --fps_candidates 8192 --num_decoder_layers 6 \
  --use_height --batch_size 8 --eval_seeds 3"
ev() {
  name=$1; shift
  # per-step end-of-round guard (see s10/s11): never start a leg that
  # could hold the lock into the driver's captures
  if [ "$(date -u +%s)" -ge 1787139000 ]; then
    echo "=== gf bigval $name SKIPPED (past 11:30Z) ==="
    return
  fi
  timeout 1800 python -m backtoreality_tpu.train.evaluate $COMMON \
    --checkpoint_path /tmp/r5_gflad_$name/ckpt_epoch_last.tar "$@" \
    > /tmp/r5_gfladeval_$name.out 2>&1
  echo "=== gf bigval $name rc=$? ==="
}
ev f32
ev t2 --bf16 --f32_tail 2 --train_data_root /tmp/shapefix/train --recal_split all
echo "S12 GF BIGVAL DONE $(date -u)"
