#!/bin/bash
# Bench-REGIME interleaved A/B (r13 verdict "next round" #1): same as
# ab_loop.sh but with --materialize, so each timed query runs with the
# users/edges/centroid caches warm — the regime bench.py measures in.
# r13's opt_time A/Bs ran cache-cold per query, and several "wins"
# (eager checkpoints of frames that were partly cache-served in the
# bench path) did not reproduce in the official bench.
# Usage: bash scripts/bench_ab.sh ROUNDS "query names..."
set -e
cd /root/repo
ROUNDS=${1:-3}
QUERIES=$2
for i in $(seq 1 "$ROUNDS"); do
  git stash -q
  timeout 590 python scripts/opt_time.py --materialize --warms 2 $QUERIES \
    2>/dev/null | grep -E "min-warm|_materialize" | sed "s/^/A$i /"
  git stash pop -q
  timeout 590 python scripts/opt_time.py --materialize --warms 2 $QUERIES \
    2>/dev/null | grep -E "min-warm|_materialize" | sed "s/^/B$i /"
done
