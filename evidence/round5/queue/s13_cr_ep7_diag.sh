#!/bin/bash
# Round-5 stage 13 (cheap, ~5 min): jitter_diag of the fresh 5x CR
# pair's ep-7 checkpoint, both domains — gives the ep7-vs-ep29
# comparison WITHIN one run (the round-4 ep7 numbers came from the
# /tmp-cleanup-truncated pair, a different draw).
cd /root/repo
set -x
for dom in real virtual; do
  if [ "$(date -u +%s)" -ge 1787139000 ]; then
    echo "=== cr ep7 diag $dom SKIPPED (past 11:30Z) ==="
    continue
  fi
  timeout 1200 python -m backtoreality_tpu.tools.jitter_diag \
    --ckpt /tmp/r5_cr_ours/ckpt_ep7.tar \
    --config /tmp/r5_cr_ours/config.json \
    --data_root /tmp/br/$dom > /tmp/r5_cr_diag7_$dom.out 2>&1
  echo "=== cr ep7 diag $dom rc=$? ==="
done
echo "S13 CR EP7 DIAG DONE $(date -u)"
