#!/bin/bash
# Round-5 post-soak chip queue: once the soak releases the single
# tunneled chip, capture the remaining round evidence shortest-first so
# a late wedge costs the tail, not everything:
#   1. full golden corpus on the TPU backend -> GOLDEN_TPU_r05.log
#   2. pallas-path bench (cached gate verdict) -> appended to the log
#   3. traversal benchmark (fused R=4 scan rounds) -> appended
# Usage: post_soak_chip_tasks.sh <soak_pid> [logfile]
set -u
SOAK_PID=${1:?need soak pid}
LOG=${2:-/tmp/post_soak_tasks.log}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

say() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

say "waiting for soak pid $SOAK_PID to exit"
while kill -0 "$SOAK_PID" 2>/dev/null; do sleep 30; done
say "soak exited; starting chip tasks (importance order: bench, traversal, golden)"

say "== pallas bench (cached gate verdict) =="
KREEQ_TPU_BENCH_DEADLINE=900 python bench.py \
    > /tmp/bench_r5_final.out 2> /tmp/bench_r5_final.err
say "bench rc=$? last line: $(tail -1 /tmp/bench_r5_final.out | cut -c1-200)"

say "== traversal bench (fused scan rounds) =="
timeout 1800 python scripts/bench_subgraph.py \
    > /tmp/trav_r5.out 2>&1
say "traversal rc=$? tail: $(grep -E 'batched traversal|speedup' /tmp/trav_r5.out | tr '\n' ' ')"

say "== golden corpus on TPU backend =="
timeout 1200 bin/kreeq-validate /root/reference/validateFiles \
    > /tmp/golden_tpu_r05.raw 2>&1
rc=$?
pass=$(grep -c PASS /tmp/golden_tpu_r05.raw)
say "golden corpus rc=$rc pass=$pass/51"
{
  echo "# Golden corpus on the TPU backend (axon, single v5e chip) — round 5"
  echo "# $(date -u +%FT%TZ)  rc=$rc"
  sed 's/\x1b\[[0-9;]*m//g' /tmp/golden_tpu_r05.raw
} > GOLDEN_TPU_r05.log
say "all chip tasks done"
