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
# per-step end-of-round guards: a stage that acquires the lock late
# sheds sub-steps rather than holding the lock into the driver's
# bench/dryrun captures (round-4 lesson; start-only guards bound the
# start, not the end)
for attempt in 1 2; do
  [ "$(date -u +%s)" -ge 1787136600 ] && { echo "S4B resume attempt $attempt SKIPPED (past 10:50Z)"; break; }
  timeout 3000 python -m backtoreality_tpu.train.votenet_br_center_refine \
    $COMMON --max_epoch 30 --resume
  rc=$?
  [ $rc -eq 0 ] && break
done
cp /tmp/r5_cr_ours/train_BR_CenterRefine.tar /tmp/r5_cr_ours/ckpt_ep29.tar
echo "S4B CR RESUME rc=$rc"
# convergence-point diagnosis (verdict item 5): does the jitter head
# recover the 5x error at schedule end where it failed at ep7?
for dom in real virtual; do
  if [ "$(date -u +%s)" -ge 1787138400 ]; then
    echo "=== cr ep29 diag $dom SKIPPED (past 11:20Z) ==="
    continue
  fi
  timeout 1200 python -m backtoreality_tpu.tools.jitter_diag \
    --ckpt /tmp/r5_cr_ours/ckpt_ep29.tar \
    --config /tmp/r5_cr_ours/config.json \
    --data_root /tmp/br/$dom > /tmp/r5_cr_diag29_$dom.out 2>&1
  echo "=== cr ep29 diag $dom rc=$? ==="
done
echo "S4B ALL DONE $(date -u)"
