#!/bin/bash
# Watchdog for chain_train.sh: the hosted TPU runtime occasionally wedges a
# freshly-started process on a futex (claim grant lost when the previous
# process's lease teardown overlaps its startup — observed repeatedly on
# 2026-08-20, always on the run FOLLOWING a long-compile run). The wedge
# signature is: no new log output AND ~zero CPU for minutes. Recovery is
# mechanical — kill that exact PID (from the chain's pidfile, never a
# pattern match); chain_train.sh's loop relaunches and the checkpoint
# resume loses nothing. This script automates that.
#
# Usage: chain_watchdog.sh <chain_log> [stale_secs] [pidfile]
set -u
LOG=${1:?log path}
# Must exceed the longest legitimate silence: a fresh remote compile of the
# donated superstep program runs ~6.5 quiet minutes. 10 min default.
STALE=${2:-600}
PIDFILE=${3:-/tmp/chain_train.pid}
while true; do
  sleep 60
  PID=$(cat "$PIDFILE" 2>/dev/null || true)
  [ -z "${PID:-}" ] && continue
  kill -0 "$PID" 2>/dev/null || continue
  AGE=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || echo 0) ))
  if [ "$AGE" -gt "$STALE" ]; then
    # Confirm ~zero CPU over 20s before declaring a wedge (a remote compile
    # also looks quiet but writes a log line within the stale window).
    J0=$(awk '{print $14+$15}' /proc/$PID/stat 2>/dev/null || echo 0)
    sleep 20
    J1=$(awk '{print $14+$15}' /proc/$PID/stat 2>/dev/null || echo 0)
    if [ $((J1 - J0)) -lt 10 ]; then
      echo "watchdog: killing wedged $PID (log stale ${AGE}s)" >> "$LOG"
      kill "$PID" 2>/dev/null
    fi
  fi
done
