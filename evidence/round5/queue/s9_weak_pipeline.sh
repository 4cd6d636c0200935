#!/bin/bash
# Round-5 stage 9: the weak-supervision pipeline (WSB -> BR ->
# BR+CenterRefine, + FSB upper bound) re-run on the REPRODUCIBLE
# two-domain fixture (parity_fixture --kind br, seeds 21/22/23) at 5x
# annotation error, then every stage checkpoint scored on the
# 100-scan val (seed 24) with 3 subsample seeds — the round-4
# verdict's item 6: re-state the BR>WSB / CR-vs-BR headline ordering
# with n=100 power. N=12000 (the fixture's natural scale), 600/600/300
# epochs mirroring the round-2/3 recipe.
cd /root/repo
set -x
COM="--val_data_root /tmp/br/val --train_split all --val_split all \
  --num_point 12000 --num_target 64 --fps_candidates 8192 \
  --batch_size 8 --seed 0 --guard_every_steps 0 \
  --lr_decay_steps 320,420,520"
run() { timeout 4200 python -m backtoreality_tpu.train.$1 ${@:2}; echo "=== $1 rc=$? ==="; }

run votenet_wsb $COM --data_root /tmp/br/real --center_jitter 0.5 \
  --max_epoch 600 --eval_freq 200 --log_dir /tmp/r5_pipe_wsb
run votenet_fsb $COM --data_root /tmp/br/real \
  --max_epoch 600 --eval_freq 200 --log_dir /tmp/r5_pipe_fsb
run votenet_br $COM --data_root /tmp/br/real \
  --source_data_root /tmp/br/virtual --center_jitter 0.5 \
  --max_epoch 600 --eval_freq 200 --log_dir /tmp/r5_pipe_br
run votenet_br_center_refine $COM --data_root /tmp/br/real \
  --source_data_root /tmp/br/virtual --center_jitter 0.5 \
  --learning_rate 0.0003 --max_epoch 300 --eval_freq 150 \
  --checkpoint_path /tmp/r5_pipe_br/train_BR.tar \
  --log_dir /tmp/r5_pipe_cr

EV="--data_root /tmp/br_bigval/val --split all --num_point 12000 \
  --num_target 64 --fps_candidates 8192 --batch_size 8 --eval_seeds 3"
ev() {
  name=$1; shift
  timeout 3000 python -m backtoreality_tpu.train.evaluate \
    --model votenet $EV "$@" > /tmp/r5_pipeeval_$name.out 2>&1
  echo "=== pipeeval $name rc=$? ==="
}
ev wsb --checkpoint_path /tmp/r5_pipe_wsb/checkpoint.tar
ev fsb --checkpoint_path /tmp/r5_pipe_fsb/checkpoint.tar
ev br --kind da --checkpoint_path /tmp/r5_pipe_br/train_BR.tar
ev cr --kind da_jitter --checkpoint_path /tmp/r5_pipe_cr/train_BR_CenterRefine.tar
echo "S9 WEAK PIPELINE DONE $(date -u)"
