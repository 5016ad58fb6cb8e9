"""Catch learning diagnostic on the real TPU: does agent X's full device
path (replay flavor included) learn at the chains' operating point?

B=128 streams, throughput batch (1024), 400k frames, return logged every
~40k. Catch returns live in [-1, 1]; dqn reaches ~0.5+ by 200-400k frames
at this config (round-4 LR-scaling A/B). A flat curve here means the
agent's mechanics are broken; a rising one clears them.

One agent per process (CLAUDE.md): pass the agent name.
Usage: nohup python tools/diag_catch_tpu.py prioritized > log 2>&1 &
"""

import functools
import json
import sys

import jax


def main():
  agent = sys.argv[1] if len(sys.argv) > 1 else "dqn"
  frames = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
  # Optional spec overrides as k=v pairs (floats), e.g. priority_exponent=0
  # to run an agent with uniform replay — component isolation.
  overrides = {}
  for kv in sys.argv[3:]:
    k, v = kv.split("=")
    overrides[k] = float(v)
  from dqn_zoo_tpu.run.train import build_engine

  mode = "parity" if "parity" in overrides else "throughput"
  overrides.pop("parity", None)
  b = 128
  eng = build_engine(agent, "catch", b, replay_capacity=200_000,
                     num_iterations=1, num_train_frames=frames,
                     max_frames_per_episode=2000,
                     replay_ratio_mode=mode,
                     spec_overrides=overrides or None)
  state = eng.init(jax.random.PRNGKey(3))
  chunk = 80  # supersteps per fetch: 80*512 ≈ 41k frames
  run = jax.jit(functools.partial(eng.run, num_supersteps=chunk))
  total = 0
  while total < frames:
    state = run(state)
    m = jax.device_get(eng.metrics(state))
    total = int(m.env_frames)
    print(json.dumps({
        "agent": agent, "frames": total,
        "return": round(float(m.mean_episode_return), 3),
        "loss": round(float(m.last_loss), 5),
        "eps": round(float(m.exploration_epsilon), 3),
        "learn_steps": int(m.learn_steps),
    }), flush=True)


if __name__ == "__main__":
  sys.path.insert(0, ".")
  main()
