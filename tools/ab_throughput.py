"""A/B: rainbow parity-mode vs throughput-mode learning (CPU, catch).

VERDICT r3 weak #3: the learning-curve chains run --replay_ratio_mode=
throughput (one big batch per superstep, sqrt-scaled Adam LR) but that
equivalence was never validated for rainbow (Adam + PER + noisy nets may
scale differently than dqn). This runs rainbow on catch to a fixed frame
budget under:

  parity      — the exact reference schedule (batch 32, B=4 streams)
  tp_sqrt     — throughput mode, default sqrt(batch/32) LR scale
  tp_1x       — throughput mode, UNscaled reference LR
  tp_linear   — throughput mode, linear (batch/32) LR scale

and prints one JSON line per config with the mean-episode-return
trajectory. Same total sample:insert ratio everywhere.

Usage: PALLAS_AXON_POOL_IPS= nohup python tools/ab_throughput.py > /tmp/ab.log 2>&1 &
"""

import functools
import json
import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

FRAMES = 160_000
CHUNK_FRAMES = 20_000  # trajectory resolution


def run_config(name, num_envs, mode, lr_override, seed):
  from dqn_zoo_tpu.run.train import build_engine
  import numpy as np
  overrides = {}
  if lr_override is not None:
    overrides["learning_rate"] = lr_override
  eng = build_engine("rainbow", "catch", num_envs,
                     replay_capacity=8192, replay_ratio_mode=mode,
                     num_iterations=1, num_train_frames=FRAMES,
                     spec_overrides=overrides or None)
  state = eng.init(jax.random.PRNGKey(seed))
  frames_per_superstep = 4 * num_envs
  per_chunk = max(1, CHUNK_FRAMES // frames_per_superstep)
  run = jax.jit(functools.partial(eng.run, num_supersteps=per_chunk),
                donate_argnums=0)
  traj = []
  for _ in range(FRAMES // CHUNK_FRAMES):
    state = eng.reset_telemetry(state)
    state = run(state)
    m = jax.device_get(eng.metrics(state))
    traj.append(round(float(m.mean_episode_return), 3))
  print(json.dumps({
      "config": name, "seed": seed, "num_envs": num_envs,
      "batch": eng.config.batch_size,
      "lr": float(eng.spec.learning_rate),
      "returns": traj}), flush=True)
  return traj


def main():
  # Effective LRs: parity keeps the reference 6.25e-5. Throughput batch is
  # 128 (4x reference): sqrt scale -> 1.25e-4 (build_engine default),
  # 1x -> override base so the auto-sqrt lands back on 6.25e-5,
  # linear -> override so it lands on 2.5e-4.
  base = 0.00025 / 4  # rainbow reference LR
  for seed in (1,):
    run_config("parity", 4, "parity", None, seed)
    run_config("tp_sqrt", 16, "throughput", None, seed)
    run_config("tp_1x", 16, "throughput", base / 2.0, seed)
    run_config("tp_linear", 16, "throughput", base * 2.0, seed)
  return 0


if __name__ == "__main__":
  sys.exit(main())
