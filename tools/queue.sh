#!/bin/bash
# Serialized TPU/host workload queue for this 1-core, single-client-
# tunnel box. Every builder workload that touches the TPU (or hogs the
# CPU core) should run through this wrapper so it serializes against
# other queue entries AND against the driver's bench/dryrun captures
# (bench.py and __graft_entry__ block on the same lock via
# backtoreality_tpu.utils.tpu_lock).
#
# Usage:
#   tools/queue.sh <name> <command...>
#
# Runs <command...> under `flock /tmp/btr_tpu.lock`, teeing output to
# /tmp/q_<name>.out and appending a completion line `QUEUE <name>
# rc=<rc> <utc time>` so chained waiters can grep for it. flock dies
# with the process: a crashed workload never wedges the queue.
set -u
LOCK="${BTR_TPU_LOCK:-/tmp/btr_tpu.lock}"
NAME="$1"; shift
OUT="/tmp/q_${NAME}.out"
{
  echo "QUEUE ${NAME} waiting for ${LOCK} $(date -u +%H:%M:%S)"
  # the wrapped command already runs under this flock: mark it so
  # bench.py / __graft_entry__'s own hold_for_process() no-ops instead
  # of deadlocking against the wrapper
  export BTR_TPU_LOCK_HELD=1
  flock "${LOCK}" -c "$(printf '%q ' "$@")"
  rc=$?
  echo "QUEUE ${NAME} rc=${rc} $(date -u)"
} >"${OUT}" 2>&1
