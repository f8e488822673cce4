#!/bin/bash
# Round-5 post-soak chip queue (revised for the round's wall budget):
# the driver's end-of-round bench.py run captures count/probe/track/
# merge on its own, and a TPU golden-corpus log exists from round 4 —
# the ONLY number nothing else captures is the fused-scan traversal
# measurement.  Run exactly that, hard-capped so the chip is free
# before the driver's bench starts.
# Usage: post_soak_chip_tasks.sh <soak_pid> [logfile] [clear_by_epoch]
set -u
SOAK_PID=${1:?need soak pid}
LOG=${2:-/tmp/post_soak_tasks.log}
CLEAR_BY=${3:-$(date -d 21:05 +%s 2>/dev/null || echo 0)}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

say() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

say "waiting for soak pid $SOAK_PID to exit"
while kill -0 "$SOAK_PID" 2>/dev/null; do sleep 30; done
remain=$(( CLEAR_BY - $(date +%s) ))
say "soak exited; $remain s until chip must be clear"
if [ "$remain" -lt 300 ]; then
    say "not enough time for the traversal bench; leaving the chip free"
    exit 0
fi

say "== traversal bench (fused scan rounds), capped at ${remain}s =="
timeout "$remain" python scripts/bench_subgraph.py \
    > /tmp/trav_r5.out 2>&1
say "traversal rc=$? tail: $(grep -E 'DB build|batched traversal|speedup' /tmp/trav_r5.out | tr '\n' ' ')"
say "chip clear"
