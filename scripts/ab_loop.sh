#!/bin/bash
# Interleaved A/B timing: alternate stashed-baseline (A) and working-tree
# (B) runs of the same query set so VM speed drift cancels pairwise.
# Usage: bash scripts/ab_loop.sh ROUNDS "query names..."
set -e
cd /root/repo
ROUNDS=${1:-3}
QUERIES=$2
for i in $(seq 1 "$ROUNDS"); do
  git stash -q
  timeout 590 python scripts/opt_time.py --warms 2 $QUERIES 2>/dev/null \
    | grep min-warm | sed "s/^/A$i /"
  git stash pop -q
  timeout 590 python scripts/opt_time.py --warms 2 $QUERIES 2>/dev/null \
    | grep min-warm | sed "s/^/B$i /"
done
