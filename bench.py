"""Benchmark: rainbow actor-learner env-steps/s on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: steady-state environment steps (action-repeat groups) per second for
the FULL rainbow training loop — env physics + rendering + preprocessing +
prioritized replay + n-step + SGD — on one chip (BASELINE.md's
env-steps/s/chip north star).

Baseline: the reference architecture's throughput ceiling measured ON THE
SAME hardware — a single-stream run (B=1) dispatched step-by-step from
Python, which is how dqn_zoo drives its loop (SURVEY.md §3.2: host loop,
two jit calls per 64 frames). This is generous to the baseline: the real
dqn_zoo additionally pays host ALE + PIL + NumPy replay per frame.

Usage: python bench.py [--smoke] [--num_envs N] [--agent rainbow]
"""

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _force_scalar(state):
  """Scalar that depends on EVERY leaf of the state pytree.

  The remote TPU runtime defers execution as a graph: block_until_ready
  returns before the work actually runs (verified: naive timing reads
  ~8 PFLOP/s on a 4096³ matmul chain — 160× over chip peak). Only a host
  fetch forces real execution, and the fetched value must depend on all
  leaves or untouched subgraphs stay unexecuted.
  """
  total = jnp.zeros((), jnp.float32)
  for leaf in jax.tree_util.tree_leaves(state):
    total += jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
  return total


def force(state):
  return float(np.asarray(_force_scalar(state)))


def steady_rate(run, state, chunks, supersteps_per_chunk, num_envs):
  """Median per-chunk rate, each chunk forced by a host fetch."""
  import statistics
  for _ in range(2):  # discard slow post-compile executions
    state = run(state)
  force(state)
  times = []
  for _ in range(chunks):
    t0 = time.time()
    state = run(state)
    force(state)
    times.append(time.time() - t0)
  dt = statistics.median(times)
  steps = supersteps_per_chunk * num_envs
  return steps / dt, state


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--smoke", action="store_true")
  p.add_argument("--agent", default="rainbow")
  p.add_argument("--game", default="pong")
  p.add_argument("--num_envs", type=int, default=256)
  p.add_argument("--json-out", default="",
                 help="Also append this run's record to a JSON-lines file "
                      "(tools/bench_all.sh aggregates per-agent artifacts "
                      "so regressions in any agent are caught mechanically, "
                      "VERDICT r3 weak #7).")
  p.add_argument("--compute_dtype", default="",
                 help="Override the agent's compute dtype (e.g. bfloat16) — "
                      "the RESULTS.md roadmap's IQN bf16-head experiment.")
  p.add_argument("--no-baseline", action="store_true",
                 help="Skip the single-stream baseline measurement "
                      "(vs_baseline=null); saves ~1 min of lease per run.")
  args = p.parse_args()

  from dqn_zoo_tpu.run.train import build_engine

  chunk = 20 if args.smoke else 100
  chunks = 3 if args.smoke else 15

  # --- measured system: vectorized fused superstep ------------------------
  overrides = {"compute_dtype": args.compute_dtype} \
      if args.compute_dtype else None
  eng = build_engine(args.agent, args.game, args.num_envs,
                     replay_capacity=args.num_envs * 256,
                     num_iterations=200, num_train_frames=10**6,
                     spec_overrides=overrides)
  state = eng.init(jax.random.PRNGKey(0))
  run = jax.jit(functools.partial(eng.run, num_supersteps=chunk))
  state = run(state)  # compile + replay warmup
  force(state)
  rate, state = steady_rate(run, state, chunks, chunk, args.num_envs)

  # --- baseline: reference-style single-stream, per-step dispatch ---------
  if args.no_baseline:
    record = {
        "metric": f"env-steps/s/chip ({args.agent}/{args.game}, "
                  f"B={args.num_envs}, full train loop)",
        "value": round(rate, 1),
        "unit": "env-steps/s",
        "vs_baseline": None,
    }
    if args.json_out:
      with open(args.json_out, "a") as f:
        f.write(json.dumps(dict(record, agent=args.agent)) + "\n")
    print(json.dumps(record))
    return 0

  beng = build_engine(args.agent, args.game, 1, replay_capacity=2048,
                      replay_ratio_mode="parity",
                      num_iterations=200, num_train_frames=10**6)
  bstate = beng.init(jax.random.PRNGKey(1))
  bstep = jax.jit(functools.partial(beng.run, num_supersteps=1))
  for _ in range(3):  # compile + discard slow first executions
    bstate = bstep(bstate)
  force(bstate)
  n_base = 30 if args.smoke else 200
  t0 = time.time()
  for _ in range(n_base):
    bstate = bstep(bstate)
    # Per-step fetch of a SMALL leaf: the reference reads the chosen action
    # back to the host every step (SURVEY.md §3.2) — the roundtrip itself,
    # not a full-state reduction, is what its architecture pays. The EWMA
    # scalar sits on the policy path (net apply on the current stack), so
    # fetching it forces the step like the action fetch does.
    np.asarray(bstate.telemetry.state_value_ewma)
  # One full flush inside the timed window: any subgraph the per-step fetch
  # did not depend on (e.g. the last step's priority updates) still has to
  # execute; amortized over n_base steps this adds what the work costs.
  force(bstate)
  base_rate = n_base / (time.time() - t0)

  record = {
      "metric": f"env-steps/s/chip ({args.agent}/{args.game}, "
                f"B={args.num_envs}, full train loop)",
      "value": round(rate, 1),
      "unit": "env-steps/s",
      "vs_baseline": round(rate / base_rate, 1),
  }
  if args.json_out:
    with open(args.json_out, "a") as f:
      f.write(json.dumps(dict(record, agent=args.agent)) + "\n")
  print(json.dumps(record))
  return 0


if __name__ == "__main__":
  sys.exit(main())
