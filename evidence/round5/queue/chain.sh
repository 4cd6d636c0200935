#!/bin/bash
# Round-5 master TPU chain: stages run sequentially, each under the
# host TPU flock (tools/queue.sh) so driver bench/dryrun captures
# never race them.
cd /root/repo
for s in s3_br_ours s4_cr_ours s5_gf_precision s6_mp_rehearsal s7_br_bf16; do
  tools/queue.sh "${s%%_*}" "evidence/round5/queue/${s}.sh"
done
echo "R5 CHAIN DONE $(date -u)"
