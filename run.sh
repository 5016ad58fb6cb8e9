#!/bin/bash
# Runs the test suite then a short training run (mirrors the reference's
# run.sh:62-74 check: tests + a brief DQN training sanity run).
set -euo pipefail
cd "$(dirname "$0")"

python -m pytest tests/ -q

python -m dqn_zoo_tpu.run.train \
  --agent=dqn --environment_name=pong --num_envs=32 \
  --replay_capacity=8192 --num_iterations=2 --num_train_frames=50000 \
  --num_eval_frames=10000 --results_csv_path=/tmp/dqn_zoo_tpu_smoke.csv
echo "smoke run OK"
