"""Mesh scaling sweep on the virtual CPU mesh (correctness-level numbers).

Measures the distributed trainer's env-steps/s at D = 1, 2, 4, 8 virtual
devices with FIXED PER-DEVICE work (weak scaling: B streams and batch per
device), the shape real multi-chip scaling takes. On a CPU host all virtual
devices share the same cores, so absolute rates are meaningless and ideal
weak scaling is FLAT wall-clock per superstep (throughput ∝ D only until
the host saturates); the number that matters is the overhead the
distributed layer adds on top of the single-device engine — visible as
eff(D)=rate(D)/(D·rate(1)) before core saturation.

Usage: PALLAS_AXON_POOL_IPS= python tools/scaling_cpu.py
"""

import functools
import json
import os
import statistics
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["PALLAS_AXON_POOL_IPS"] = ""
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
  from dqn_zoo_tpu.run.train_dist import build_trainer
  per_dev_envs = 16
  n = 5  # supersteps per timed call
  results = []
  for d in (1, 2, 4, 8):
    trainer = build_trainer(
        "dqn", "catch", d, per_dev_envs * d,
        replay_capacity=per_dev_envs * d * 64,
        num_iterations=200, num_train_frames=10**6)
    dstate = trainer.init(jax.random.PRNGKey(0))
    run = trainer.make_run(num_supersteps=n)
    dstate = run(dstate)  # compile
    for _ in range(2):
      dstate = run(dstate)
    jax.block_until_ready(dstate)
    times = []
    for _ in range(3):
      t0 = time.perf_counter()
      dstate = run(dstate)
      jax.block_until_ready(dstate)
      times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    rate = n * per_dev_envs * d / dt
    results.append({"devices": d, "env_steps_per_s": round(rate, 1),
                    "ms_per_superstep": round(dt / n * 1e3, 3)})
    print(json.dumps(results[-1]), flush=True)
  t1 = results[0]["ms_per_superstep"]
  for r in results:
    # Work-conserving efficiency: on a shared-core CPU host the D virtual
    # devices COMPETE for the same cores, so ideal weak scaling is
    # wall-clock ∝ total work (D x the single-device superstep). This is
    # the distributed-layer overhead number; the throughput-based
    # env_steps_per_s column only becomes meaningful on real multi-chip
    # hardware where each device has its own compute.
    r["work_conserving_eff"] = round(
        r["devices"] * t1 / r["ms_per_superstep"], 3)
  print(json.dumps({"table": results}))
  return 0


if __name__ == "__main__":
  sys.exit(main())
