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


def test_distributed_eval_runs_and_counts():
  """Eval path under the mesh: sharded streams, replicated params, psum'd
  episode stats (VERDICT r2 #8)."""
  trainer = make_trainer()
  dstate = trainer.init(jax.random.PRNGKey(4))
  estate = trainer.eval_init(jax.random.PRNGKey(5), num_envs=2)
  eval_run = trainer.make_eval_run(num_supersteps=40)
  estate = eval_run(dstate.online_params, estate)
  m = trainer.eval_metrics(estate)
  assert m["env_frames"] > 0
  assert m["episodes"] > 0  # catch episodes are ~25 agent-steps
  assert np.isfinite(m["mean_episode_return"])


def test_checkpoint_roundtrip_sharded(tmp_path):
  """OrbaxCheckpoint saves/restores the SHARDED DistState without a global
  device_get; restored shards keep their shardings and values."""
  from dqn_zoo_tpu.run.checkpoint import OrbaxCheckpoint

  trainer = make_trainer()
  dstate = trainer.init(jax.random.PRNGKey(6))
  run = trainer.make_run(num_supersteps=10)
  dstate = run(dstate)

  ckpt = OrbaxCheckpoint(str(tmp_path / "ckpt"))
  ckpt.save(dstate, iteration=3, writer_state={})
  assert ckpt.can_be_restored()

  template = trainer.init(jax.random.PRNGKey(7))  # different values
  restored, iteration, _, _ = ckpt.restore(template)
  assert iteration == 3
  # Shardings survive the round-trip.
  want = jax.tree_util.tree_leaves(dstate.per_device)[0].sharding
  got = jax.tree_util.tree_leaves(restored.per_device)[0].sharding
  assert got.is_equivalent_to(want, ndim=2)
  # Values match the saved state, not the template.
  for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(dstate)),
                  jax.tree_util.tree_leaves(jax.device_get(restored))):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
  # The restored state is directly runnable under the mesh.
  restored = run(restored)
  assert trainer.metrics(restored)["env_frames"] > 0


def test_training_advances_params():
  trainer = make_trainer()
  dstate = trainer.init(jax.random.PRNGKey(3))
  p0 = jax.device_get(jax.tree_util.tree_leaves(dstate.online_params)[0])
  run = trainer.make_run(num_supersteps=25)
  dstate = run(dstate)
  p1 = jax.device_get(jax.tree_util.tree_leaves(dstate.online_params)[0])
  assert not np.array_equal(p0, p1)
