"""Worker script for the multi-process (simulated multi-host) test.

Launched N times by tests/test_multihost.py; each process contributes its
local CPU devices to a global mesh and runs the full distributed trainer —
the same program a real multi-host TPU pod slice runs under
jax.distributed.initialize (SURVEY.md §4: the reference has no distributed
tests; this harness is new capability).
"""

import os
import sys


def main():
  process_id = int(sys.argv[1])
  num_processes = int(sys.argv[2])
  port = sys.argv[3]
  devices_per_process = 2

  os.environ["XLA_FLAGS"] = (
      f"--xla_force_host_platform_device_count={devices_per_process}")
  os.environ["JAX_PLATFORMS"] = "cpu"
  import jax
  jax.config.update("jax_platforms", "cpu")
  jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                             num_processes=num_processes,
                             process_id=process_id)

  from dqn_zoo_tpu.agents import get_agent
  from dqn_zoo_tpu.engine import EngineConfig
  from dqn_zoo_tpu.envs.vector import VectorEnvConfig
  from dqn_zoo_tpu.parallel import DistributedTrainer, make_mesh

  n_dev = devices_per_process * num_processes
  assert len(jax.devices()) == n_dev
  mesh = make_mesh(jax.devices())
  cfg = EngineConfig(
      agent=get_agent("dqn"),
      game="catch",
      num_envs=2,
      slots_per_stream=32,
      batch_size=8,
      total_train_frames=100_000,
      env_config=VectorEnvConfig(episode_frame_cap=2000),
      pmap_axis="d",
      frame_multiplier=n_dev,
  )
  trainer = DistributedTrainer(cfg, mesh)
  dstate = trainer.init(jax.random.PRNGKey(0))
  run = trainer.make_run(num_supersteps=20)
  dstate = run(dstate)
  m = trainer.metrics(dstate)
  assert m["env_frames"] > 0, m
  assert m["learn_steps"] > 0, m
  # Params replicated across ALL processes' devices: compare local shards.
  leaf = jax.tree_util.tree_leaves(dstate.online_params)[0]
  import numpy as np
  shards = [np.asarray(s.data) for s in leaf.addressable_shards]
  for s in shards[1:]:
    np.testing.assert_array_equal(shards[0], s)
  print(f"MULTIHOST_OK p{process_id} frames={m['env_frames']} "
        f"learn={m['learn_steps']} eps={m['episodes']}")


if __name__ == "__main__":
  main()
