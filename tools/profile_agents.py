"""Per-agent superstep cost decomposition on the real TPU.

For each agent, times three engine variants at B=256 (the bench config):
  full     — the real training superstep (act + env + replay + learn)
  nolearn  — same but min-fill never reached (act + env + replay insert)
  noact    — nolearn with a constant-action policy (env + prep + insert)

so  act cost   = nolearn - noact
    learn cost = full - nolearn

Also times a bfloat16-compute variant of `full`. Prints one JSON line per
measurement. Follows the benchmarking rules in CLAUDE.md: chained state,
block on all leaves, discard first executions, median over chunks.

Usage: nohup python tools/profile_agents.py > /tmp/prof.log 2>&1 &
"""

import dataclasses
import functools
import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp


def trivial_act(network, params, key, obs, epsilon):
  b = obs.shape[0]
  # Depend on obs so nothing is hoisted, but no network apply.
  h = (obs[:, ::21, ::21, 0].astype(jnp.int32).sum(axis=(1, 2))
       + jax.random.randint(key, (b,), 0, 3))
  return h % 3, jnp.zeros((b,), jnp.float32)


def median_rate(run, state, chunks, supersteps, num_envs):
  from bench import force  # host-fetch forcing; see bench._force_scalar
  for _ in range(3):
    state = run(state)
  force(state)
  times = []
  for _ in range(chunks):
    t0 = time.time()
    state = run(state)
    force(state)
    times.append(time.time() - t0)
  dt = statistics.median(times)
  return supersteps * num_envs / dt, dt / supersteps


def time_engine(eng, chunks=10, supersteps=50):
  state = eng.init(jax.random.PRNGKey(0))
  run = jax.jit(functools.partial(eng.run, num_supersteps=supersteps))
  state = run(state)
  jax.block_until_ready(jax.tree_util.tree_leaves(state))
  return median_rate(run, state, chunks, supersteps, eng.config.num_envs)


def main():
  from dqn_zoo_tpu.engine.superstep import Engine
  from dqn_zoo_tpu.run.train import build_engine

  b = 256
  agents = sys.argv[1:] or ["dqn", "rainbow", "qrdqn", "iqn"]
  for name in agents:
    results = {}
    for variant in ["full", "nolearn", "noact", "bf16"]:
      kwargs = dict(replay_capacity=b * 256, num_iterations=200,
                    num_train_frames=10**6)
      if variant in ("nolearn", "noact"):
        kwargs["min_replay_capacity_fraction"] = 1e9
      eng = build_engine(name, "pong", b, **kwargs)
      if variant == "noact":
        spec = dataclasses.replace(eng.config.agent, act=trivial_act)
        eng = Engine(dataclasses.replace(eng.config, agent=spec))
      elif variant == "bf16":
        spec = dataclasses.replace(eng.config.agent,
                                   compute_dtype="bfloat16")
        eng = Engine(dataclasses.replace(eng.config, agent=spec))
      rate, per_ss = time_engine(eng)
      results[variant] = per_ss
      print(json.dumps({"agent": name, "variant": variant,
                        "env_steps_per_s": round(rate, 1),
                        "ms_per_superstep": round(per_ss * 1e3, 3)}),
            flush=True)
    d = results
    print(json.dumps({"agent": name,
                      "ms_env_prep_insert": round(d["noact"] * 1e3, 3),
                      "ms_act": round((d["nolearn"] - d["noact"]) * 1e3, 3),
                      "ms_learn": round((d["full"] - d["nolearn"]) * 1e3, 3),
                      "bf16_speedup": round(d["full"] / d["bf16"], 2)}),
          flush=True)


if __name__ == "__main__":
  main()
