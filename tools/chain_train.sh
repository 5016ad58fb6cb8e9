#!/bin/bash
# Chained checkpoint-split training: N short processes resuming via orbax,
# each exiting cleanly after --iterations_per_run (the hosted TPU runtime
# bounds single-process device time to ~6-8 min; CLAUDE.md env rules).
set -u
AGENT=${1:-dqn}
GAME=${2:-pong}
RUNS=${3:-6}
ITERS_PER_RUN=${4:-4}
NUM_ITERS=${5:-24}
SEED=${6:-3}
# /tmp does not survive machine restarts (a 10M-frame rainbow chain lost its
# resume state that way on 2026-08-20); default somewhere persistent.
CKPT=${CKPT:-/root/repo/.ckpt/${AGENT}_${GAME}_s${SEED}}
CSV=${CSV:-/root/repo/results/${AGENT}_${GAME}_$((NUM_ITERS * 2))M_seed${SEED}.csv}
for i in $(seq 1 "$RUNS"); do
  echo "=== run $i/$RUNS $(date)"
  python -m dqn_zoo_tpu.run.train --agent="$AGENT" \
    --environment_name="$GAME" --num_envs=128 --replay_capacity=1000000 \
    --seed="$SEED" --num_iterations="$NUM_ITERS" --num_train_frames=2000000 \
    --num_eval_frames=500000 --iterations_per_run="$ITERS_PER_RUN" \
    --checkpoint_path="$CKPT" --results_csv_path="$CSV" \
    --checkpoint_replay=false --checkpoint_period=1
  echo "=== run $i exited rc=$? $(date)"
  # Lease teardown after a CLEAN heavy-run exit lingers for minutes; a
  # process started inside that window waits on a futex for a grant that
  # never arrives (observed 4x on 2026-08-20: 45s and 120s gaps both wedged
  # alternating runs, while runs started after a kill — immediate teardown —
  # always claimed fine). 300s clears the lingering lease; pair with
  # tools/chain_watchdog.sh as the backstop.
  sleep 300
done
