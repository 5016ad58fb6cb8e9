"""Bisect the round-2 bench regression: fused Pallas torso vs XLA convs.

Measures the FULL rainbow train loop (bench.py methodology: fetch-forced
chunks, median) with the torso dispatch toggled, interleaved A/B in one
process with the first measured config discarded (CLAUDE.md bench rules).

Run on the real TPU: python tools/bisect_torso.py
"""

import functools
import statistics
import time

import jax
import numpy as np

from dqn_zoo_tpu.nets import torso_pallas
from dqn_zoo_tpu.run.train import build_engine
from bench import force

B = 256
CHUNK = 100


def make(fused: bool):
  orig = torso_pallas.fused_ok
  if not fused:
    torso_pallas.fused_ok = lambda x: False
  try:
    eng = build_engine("rainbow", "pong", B, replay_capacity=B * 256,
                       num_iterations=200, num_train_frames=10**6)
    state = eng.init(jax.random.PRNGKey(0))
    run = jax.jit(functools.partial(eng.run, num_supersteps=CHUNK))
    state = run(state)  # compile + warmup (traces with the patched gate)
    force(state)
    state = run(state)
    force(state)
  finally:
    torso_pallas.fused_ok = orig
  return run, state


def measure(run, state, chunks=4):
  times = []
  for _ in range(chunks):
    t0 = time.time()
    state = run(state)
    force(state)
    times.append(time.time() - t0)
  return CHUNK * B / statistics.median(times), state


def main():
  print("devices:", jax.devices())
  rf, sf = make(fused=True)
  rx, sx = make(fused=False)
  # first measured config in a process is untrustworthy: discard pass 0
  for name, (r, s) in [("warmup", (rf, sf))]:
    rate, sf = measure(r, s, chunks=2)
    print(f"{name}: {rate:.0f} (discarded)")
  results = {"fused": [], "xla": []}
  state = {"fused": sf, "xla": sx}
  runs = {"fused": rf, "xla": rx}
  for p in range(2):
    for name in ("xla", "fused"):
      rate, state[name] = measure(runs[name], state[name])
      results[name].append(rate)
      print(f"pass {p} {name}: {rate:.0f} env-steps/s")
  for name, v in results.items():
    print(f"FINAL {name}: {max(v):.0f} env-steps/s (passes: "
          f"{[round(x) for x in v]})")


if __name__ == "__main__":
  main()
