#!/bin/bash
# Sequential chain queue for the round-5 learning-curve sweep (VERDICT r4
# #1: TPU curves for the five agents without learning evidence). Runs each
# agent/game chain to completion via chain_train.sh, with the reference's
# ABSOLUTE epsilon anneal (4M frames regardless of horizon — the
# proportional default compresses it to ~300k at these horizons, which
# measurably stalled prioritized/breakout: flat at 10M frames, see
# .logs/prioritized_breakout_flat_fasteps.csv).
#
# Each chain gets its OWN pidfile + log + watchdog, and the watchdog dies
# with its chain: a watchdog left pointing at a previous chain's stale log
# while reading a shared pidfile will kill the NEXT chain's quiet remote
# compiles (observed: chain-2 run 2 SIGTERMed at 2 min by chain-1's
# leftover watchdog).
#
# Usage: nohup bash tools/chain_queue.sh > .logs/chain_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p .logs

run_chain() {  # agent game iters frac
  local agent=$1 game=$2 iters=$3 frac=$4
  local log=".logs/chain_${agent}_${game}.log"
  local pidfile="/tmp/chain_${agent}_${game}.pid"
  echo "=== QUEUE: $agent/$game iters=$iters eps_frac=$frac $(date)"
  bash tools/chain_watchdog.sh "$log" 600 "$pidfile" >> "$log.wd" 2>&1 &
  local wd=$!
  EXTRA_FLAGS="--exploration_epsilon_decay_frame_fraction=$frac" \
    SAVE_EVERY=45 PIDFILE="$pidfile" \
    bash tools/chain_train.sh "$agent" "$game" 60 "$iters" 3 > "$log" 2>&1
  kill "$wd" 2>/dev/null
  echo "=== QUEUE: $agent/$game done $(date)"
  sleep 300  # lease teardown before the next chain's first claim
}

# 2M train + 0.5M eval frames per iteration (chain_train.sh).
# DQN-family validation runs on PONG: breakout is slow for 1-step agents
# in ALE and here (prioritized flat to 16M with the slow anneal, archived
# in .logs/), while this exact regime demonstrably learns pong (round-3
# dqn crossing at 22M). PER mechanics themselves are validated on catch
# (tools/diag_catch_tpu.py parity runs: prioritized +0.33 vs dqn +0.30 at
# 600k frames).
# (double_q/pong completed: results/double_q_pong_24M_seed3.csv)
# prioritized rerun AFTER the IS-weight chunk-normalization fix (its first
# 24M-frame run was flat: global-max normalization over batch-1024 crushed
# the mean IS weight ~2.3x — .logs/prioritized_pong_flat_isweights.csv).
run_chain prioritized pong 12 0.17   # 24M frames, anneal ~4M
run_chain c51 seaquest 5 0.4        # 10M frames, anneal 4M
run_chain qrdqn seaquest 5 0.4      # 10M frames, anneal 4M
run_chain iqn pong 10 0.2           # 20M frames, anneal 4M
echo "=== QUEUE complete $(date)"
