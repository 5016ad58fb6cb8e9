#!/bin/bash
# Per-agent bench sweep → BENCH_AGENTS.json (JSON-lines, one per agent).
# Each agent runs in its own process (the hosted runtime bounds a process's
# device lease to ~5-7 min; one compile+measure fits comfortably), with the
# 300s inter-process gap that avoids the lingering-lease futex wedge
# (tools/chain_train.sh's comment). The rainbow headline keeps its
# vs_baseline measurement; the other agents skip the single-stream baseline
# to stay short (--no-baseline).
#
# Usage: nohup bash tools/bench_all.sh > /tmp/bench_all.log 2>&1 &
set -u
OUT=${OUT:-/root/repo/BENCH_AGENTS.json}
SMOKE=${SMOKE:-}
rm -f "$OUT"
for agent in rainbow dqn double_q prioritized c51 qrdqn iqn; do
  echo "=== $agent $(date)"
  extra="--no-baseline"
  [ "$agent" = rainbow ] && extra=""
  # shellcheck disable=SC2086
  python bench.py --agent="$agent" --json-out="$OUT" $SMOKE $extra
  echo "=== $agent done rc=$? $(date)"
  sleep 300
done
echo "=== sweep complete $(date)"
cat "$OUT"
