"""TPU verify probe: IQN with the fused per-τ Pallas head.

Measures fetch-forced superstep time (methodology: CLAUDE.md benchmarking
rules — chained state, discard 2+ post-compile calls, median over chunks)
and checks learning progresses (finite loss, learn steps advance).
"""

import functools
import statistics
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import force  # noqa: E402
from dqn_zoo_tpu.run.train import build_engine  # noqa: E402


def rate(agent, chunk, chunks, b=256):
  eng = build_engine(agent, "pong", b, replay_capacity=b * 256)
  state = eng.init(jax.random.PRNGKey(0))
  run = jax.jit(functools.partial(eng.run, num_supersteps=chunk))
  t0 = time.time()
  state = run(state)
  force(state)
  print(f"[{agent}] compile+first: {time.time()-t0:.1f}s", flush=True)
  for _ in range(2):
    state = run(state)
  force(state)
  ts = []
  for _ in range(chunks):
    t0 = time.time()
    state = run(state)
    force(state)
    ts.append(time.time() - t0)
  dt = statistics.median(ts)
  m = eng.metrics(state)
  loss = float(np.asarray(m.last_loss))
  learns = int(np.asarray(m.learn_steps))
  print(f"[{agent}] {1000*dt/chunk:.2f} ms/superstep, "
        f"{chunk*b/dt:.0f} env-steps/s, last_loss={loss:.4f}, "
        f"learn_steps={learns}", flush=True)
  assert np.isfinite(loss), f"{agent}: non-finite loss"
  assert learns > 0, f"{agent}: no learn steps"


if __name__ == "__main__":
  which = sys.argv[1] if len(sys.argv) > 1 else "iqn"
  if which == "iqn":
    rate("iqn", chunk=20, chunks=8)
  else:
    rate("rainbow", chunk=50, chunks=8)
    rate("dqn", chunk=50, chunks=8)
  print("VERIFY_OK", flush=True)
