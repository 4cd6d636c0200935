#!/bin/bash
# Round-5 stage 14: ref-side convergence diagnosis — import the torch
# CR ref leg's ep-29 checkpoint and jitter_diag it on the jittered
# (real) domain, completing the ep29 ours-vs-ref diag pair the same
# way round 4 paired them at ep7. Waits (with deadline) for the CPU
# chain to finish the CR ref resume leg.
cd /root/repo
set -x
while [ ! -f /tmp/r5_cr_ref/ckpt_ep29.tar ]; do
  if [ "$(date -u +%s)" -ge 1787138700 ]; then
    echo "S14 SKIPPED (ref ep29 checkpoint not ready by 11:25Z)"
    exit 0
  fi
  sleep 60
done
python -m backtoreality_tpu.tools.torch_import \
  /tmp/r5_cr_ref/ckpt_ep29.tar --model votenet_da_jitter \
  --out /tmp/r5_cr_ref_ep29.tar || exit 1
for dom in real virtual; do
  if [ "$(date -u +%s)" -ge 1787139300 ]; then
    echo "=== cr ref ep29 diag $dom SKIPPED (past 11:35Z) ==="
    continue
  fi
  timeout 1200 python -m backtoreality_tpu.tools.jitter_diag \
    --ckpt /tmp/r5_cr_ref_ep29.tar \
    --config /tmp/r5_cr_ours/config.json \
    --data_root /tmp/br/$dom > /tmp/r5_cr_refdiag29_$dom.out 2>&1
  echo "=== cr ref ep29 diag $dom rc=$? ==="
done
echo "S14 CR REF DIAG DONE $(date -u)"
