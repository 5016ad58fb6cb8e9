"""Quick per-agent full-loop rate sweep on the real TPU (one process).

Times the FULL training superstep (act + env + prep + replay + learn) for
each requested agent at the bench config (B=256, pong), using the fetch-
forced methodology from bench.py (CLAUDE.md benchmarking rules). Prints one
JSON line per agent. Kept deliberately short (~1 min/agent) so the whole
sweep stays inside the hosted runtime's single-process lease (~6 min).

Usage: nohup python tools/agent_rates.py dqn qrdqn iqn > /tmp/rates.log 2>&1 &
"""

import functools
import json
import os
import sys
import time
import statistics

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
  agents = sys.argv[1:] or ["dqn", "qrdqn", "iqn"]
  from bench import force
  from dqn_zoo_tpu.run.train import build_engine
  # CLAUDE.md benchmarking rules: the FIRST measured config in a process
  # carries one-time runtime-init bias. Burn a small throwaway config (its
  # number is discarded) before the measured loop.
  warm = build_engine(agents[0], "pong", 64, replay_capacity=64 * 64,
                      num_iterations=200, num_train_frames=10**6)
  wstate = warm.init(jax.random.PRNGKey(1))
  wrun = jax.jit(functools.partial(warm.run, num_supersteps=10))
  for _ in range(3):
    wstate = wrun(wstate)
  force(wstate)
  del warm, wstate, wrun
  for agent in agents:
    t_start = time.time()
    eng = build_engine(agent, "pong", 256, replay_capacity=256 * 256,
                       num_iterations=200, num_train_frames=10**6)
    state = eng.init(jax.random.PRNGKey(0))
    n = 50
    run = jax.jit(functools.partial(eng.run, num_supersteps=n))
    state = run(state)
    force(state)
    for _ in range(2):  # discard slow post-compile executions
      state = run(state)
    force(state)
    times = []
    for _ in range(8):
      t0 = time.time()
      state = run(state)
      force(state)
      times.append(time.time() - t0)
    dt = statistics.median(times)
    print(json.dumps({"agent": agent, "env_steps_per_s": round(n * 256 / dt, 1),
                      "ms_per_superstep": round(dt / n * 1e3, 3),
                      "total_s": round(time.time() - t_start, 1)}), flush=True)
  return 0


if __name__ == "__main__":
  sys.exit(main())
