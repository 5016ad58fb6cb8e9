#!/bin/bash
# Chained checkpoint-split training: N short processes resuming via orbax.
# The hosted TPU runtime revokes a process's device lease ~5-6.5 min after
# claim (FAILED_PRECONDITION mid-work; round-3 breakout chain died 5/5 inside
# its first train phase). Each leg therefore runs under a wall-clock budget
# (--max_run_seconds, measured from first device fetch) with mid-train
# checkpoint saves (--save_interval_seconds), so progress is monotone even
# when a leg is killed by the lease: at most ~1 save interval of work lost.
set -u
AGENT=${1:-dqn}
GAME=${2:-pong}
RUNS=${3:-6}
NUM_ITERS=${4:-24}
SEED=${5:-3}
# /tmp does not survive machine restarts (a 10M-frame rainbow chain lost its
# resume state that way on 2026-08-20); default somewhere persistent.
CKPT=${CKPT:-/root/repo/.ckpt/${AGENT}_${GAME}_s${SEED}}
CSV=${CSV:-/root/repo/results/${AGENT}_${GAME}_$((NUM_ITERS * 2))M_seed${SEED}.csv}
BUDGET=${BUDGET:-240}
SAVE_EVERY=${SAVE_EVERY:-75}
PIDFILE=${PIDFILE:-/tmp/chain_train.pid}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jaxcache}
for i in $(seq 1 "$RUNS"); do
  echo "=== run $i/$RUNS $(date)"
  python -m dqn_zoo_tpu.run.train --agent="$AGENT" \
    --environment_name="$GAME" --num_envs=128 --replay_capacity=1000000 \
    --seed="$SEED" --num_iterations="$NUM_ITERS" --num_train_frames=2000000 \
    --num_eval_frames=500000 --eval_num_envs=16 \
    --max_run_seconds="$BUDGET" --save_interval_seconds="$SAVE_EVERY" \
    --checkpoint_path="$CKPT" --results_csv_path="$CSV" \
    --checkpoint_replay=false --checkpoint_period=1 ${EXTRA_FLAGS:-} &
  echo $! > "$PIDFILE"
  wait $!
  rc=$?
  rm -f "$PIDFILE"
  echo "=== run $i exited rc=$rc $(date)"
  # Done? meta records next iteration; stop once it exceeds NUM_ITERS.
  DONE=$(python - "$CKPT" "$NUM_ITERS" <<'EOF'
import sys, os, numpy as np
p = os.path.join(sys.argv[1], "meta.npz")
try:
  print(1 if int(np.load(p, allow_pickle=True)["iteration"]) > int(sys.argv[2]) else 0)
except Exception:
  print(0)
EOF
)
  [ "$DONE" = "1" ] && { echo "=== chain complete $(date)"; break; }
  # Lease teardown after a CLEAN heavy-run exit lingers for minutes; a
  # process started inside that window waits on a futex for a grant that
  # never arrives (observed 4x on 2026-08-20: 45s and 120s gaps both wedged
  # alternating runs, while runs started after a kill — immediate teardown —
  # always claimed fine). 300s clears the lingering lease; pair with
  # tools/chain_watchdog.sh as the backstop. After a lease-death exit
  # (rc!=0) teardown is immediate — a shorter gap keeps the duty cycle up
  # in degraded-lease regimes where every leg dies by revocation.
  if [ "$rc" = "0" ]; then sleep 300; else sleep 120; fi
done
