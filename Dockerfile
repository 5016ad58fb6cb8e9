# dqn_zoo_tpu container image — the TPU analogue of the reference's CUDA
# image (ref Dockerfile:1-60: CUDA base, pinned deps, ROM import, full test
# sweep at build time). TPU runtimes are provisioned by the host (libtpu via
# the cloud image), so the base is plain Python + jax[tpu].

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential make g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace

# Pinned dependencies (jax[tpu] pulls libtpu matching the host driver).
COPY requirements.txt /workspace/
RUN python -m pip install --upgrade pip && \
    python -m pip install -r requirements.txt

# Source + native env farm.
COPY dqn_zoo_tpu /workspace/dqn_zoo_tpu
COPY cpp /workspace/cpp
COPY tests /workspace/tests
COPY bench.py run.sh /workspace/
RUN make -C cpp

# Build-time test sweep on CPU (the reference runs every *_test module,
# ref Dockerfile:46-57); the vendored conftest forces the CPU backend and an
# 8-device virtual mesh for the sharding tests.
ARG RUN_TESTS=1
RUN if [ "$RUN_TESTS" = "1" ]; then \
      PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q -x; \
    fi

# Build-time TRAINING smoke (the reference ends its check with a short real
# training run, run.sh:62-74 / Dockerfile:45-62): two tiny iterations of
# DQN on pong through the full CLI on CPU, mirroring the reference's
# shrunk-flag run (replay 1000, 10x1000 frames).
ARG RUN_TRAIN_SMOKE=1
RUN if [ "$RUN_TRAIN_SMOKE" = "1" ]; then \
      PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m dqn_zoo_tpu.run.train \
        --agent=dqn --environment_name=pong --num_envs=4 \
        --replay_capacity=1024 --num_iterations=2 --num_train_frames=2000 \
        --num_eval_frames=800 --max_frames_per_episode=2000 --batch_size=8 \
        --eval_num_envs=2 --results_csv_path=/tmp/train_smoke.csv && \
      test "$(wc -l < /tmp/train_smoke.csv)" -ge 3; \
    fi

# Executable container: `docker run dqn_zoo_tpu:latest -m
# dqn_zoo_tpu.run.train --agent=dqn --environment_name=pong ...`
ENTRYPOINT ["python"]
