"""Multi-chip tests on the virtual 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu.agents import get_agent
from dqn_zoo_tpu.engine import EngineConfig
from dqn_zoo_tpu.envs.vector import VectorEnvConfig
from dqn_zoo_tpu.parallel import DistributedTrainer, make_mesh


def make_trainer(n_devices=8, agent="dqn", envs_per_device=2):
  mesh = make_mesh(jax.devices()[:n_devices])
  cfg = EngineConfig(
      agent=get_agent(agent),
      game="catch",
      num_envs=envs_per_device,
      slots_per_stream=32,
      batch_size=8,
      learn_every=1,
      updates_per_learn=1,
      total_train_frames=100_000,
      env_config=VectorEnvConfig(episode_frame_cap=2000),
      pmap_axis="d",
      frame_multiplier=n_devices,
  )
  return DistributedTrainer(cfg, mesh)


def test_distributed_runs_and_learns():
  trainer = make_trainer()
  dstate = trainer.init(jax.random.PRNGKey(0))
  run = trainer.make_run(num_supersteps=25)
  dstate = run(dstate)
  m = trainer.metrics(dstate)
  assert m["env_frames"] > 0
  assert m["learn_steps"] > 0
  assert m["episodes"] > 0


def test_params_stay_replicated():
  """pmean'd grads + deterministic optimizer must keep params identical on
  every device even though each device sees different data."""
  trainer = make_trainer()
  dstate = trainer.init(jax.random.PRNGKey(1))
  run = trainer.make_run(num_supersteps=20)
  dstate = run(dstate)
  # Pull each device's copy of one parameter and compare.
  leaf = jax.tree_util.tree_leaves(dstate.online_params)[0]
  shards = [np.asarray(s.data) for s in leaf.addressable_shards]
  for s in shards[1:]:
    np.testing.assert_array_equal(shards[0], s)


def test_per_device_streams_diverge():
  trainer = make_trainer()
  dstate = trainer.init(jax.random.PRNGKey(2))
  run = trainer.make_run(num_supersteps=10)
  dstate = run(dstate)
  per = jax.device_get(dstate.per_device)
  # env RNG and replay contents must differ across devices
  rngs = np.asarray(per.rng)  # (D, 2)
  assert len({tuple(r) for r in rngs}) == rngs.shape[0]
  frames = np.asarray(per.replay.frames)  # (D, S, C+W, RH, RW) padded rows
  assert not all(
      np.array_equal(frames[0], frames[i]) for i in range(1, len(frames)))


def test_training_advances_params():
  trainer = make_trainer()
  dstate = trainer.init(jax.random.PRNGKey(3))
  p0 = jax.device_get(jax.tree_util.tree_leaves(dstate.online_params)[0])
  run = trainer.make_run(num_supersteps=25)
  dstate = run(dstate)
  p1 = jax.device_get(jax.tree_util.tree_leaves(dstate.online_params)[0])
  assert not np.array_equal(p0, p1)
