"""Tests for the host compatibility layer: parts, processors, dm adapter.

Mirrors the reference's parts_test.py (run_loop event sequence via a
tape-recording fake agent/env, parts_test.py:78-168), gym_atari_test.py
(dm_env interface contract mixin), and the action-repeat contract test
(processors_test.py:140-194).
"""

import dm_env
from dm_env import specs, test_utils
import numpy as np
import pytest

from dqn_zoo_tpu import parts, processors
from dqn_zoo_tpu.envs.dm_adapter import JaxGameEnvironment


class TapeAgent(parts.Agent):
  """Records the step types it sees; returns constant action."""

  def __init__(self):
    self.tape = []

  def step(self, timestep):
    self.tape.append(("agent_step", int(timestep.step_type)))
    return 0

  def reset(self):
    self.tape.append(("agent_reset",))

  def get_state(self):
    return {}

  def set_state(self, state):
    del state

  @property
  def statistics(self):
    return {"state_value": 0.5}


class FakeEnv(dm_env.Environment):
  """Fixed-length episodes of `length` steps after FIRST."""

  def __init__(self, length):
    self._length = length
    self._t = None

  def reset(self):
    self._t = 0
    return dm_env.restart(np.zeros((2, 2), np.uint8))

  def step(self, action):
    del action
    self._t += 1
    obs = np.full((2, 2), self._t, np.uint8)
    if self._t >= self._length:
      return dm_env.termination(1.0, obs)
    return dm_env.transition(0.0, obs)

  def observation_spec(self):
    return specs.Array(shape=(2, 2), dtype=np.uint8)

  def action_spec(self):
    return specs.DiscreteArray(num_values=2)


def test_run_loop_event_sequence():
  agent = TapeAgent()
  env = FakeEnv(length=3)
  gen = parts.run_loop(agent, env)
  events = []
  for i, (e, ts, a, act) in enumerate(gen):
    events.append(int(ts.step_type))
    if i >= 7:  # two episodes worth: F M M L F M M L
      break
  F, M, L = (int(dm_env.StepType.FIRST), int(dm_env.StepType.MID),
             int(dm_env.StepType.LAST))
  assert events == [F, M, M, L, F, M, M, L]
  # agent saw reset before each episode and an (extra) step on LAST
  resets = [t for t in agent.tape if t[0] == "agent_reset"]
  assert len(resets) == 2


def test_run_loop_truncation():
  agent = TapeAgent()
  env = FakeEnv(length=100)
  gen = parts.run_loop(agent, env, max_steps_per_episode=5)
  steps = []
  for i, (e, ts, a, act) in enumerate(gen):
    steps.append(int(ts.step_type))
    if i >= 5:
      break
  # 5 steps then forced LAST
  assert steps[-1] == int(dm_env.StepType.LAST)
  assert steps[0] == int(dm_env.StepType.FIRST)


def test_generate_statistics_merges_trackers():
  agent = TapeAgent()
  env = FakeEnv(length=3)
  import itertools
  seq = itertools.islice(parts.run_loop(agent, env), 8)
  stats = parts.generate_statistics(parts.make_default_trackers(agent), seq)
  assert stats["num_episodes"] == 2
  assert stats["episode_return"] == 1.0
  assert "step_rate" in stats
  assert abs(stats["state_value"] - 0.5) < 1e-6


def test_ewma_tracker_unbiased_constant():
  agent = TapeAgent()
  tr = parts.UnbiasedExponentialWeightedAverageAgentTracker(1e-3, agent)
  for _ in range(10):
    tr.step(None, None, agent, None)
  # constant statistic → EWMA equals it exactly (bias corrected)
  assert abs(tr.get()["state_value"] - 0.5) < 1e-9
  assert 0 < tr.trace < 1


class CatchEnvContractTest(test_utils.EnvironmentTestMixin,
                           __import__("absl.testing.absltest",
                                      fromlist=["TestCase"]).TestCase):
  """dm_env interface-contract mixin (ref gym_atari_test.py:39-45) —
  runs under pytest because absltest.TestCase extends unittest.TestCase."""

  def make_object_under_test(self):
    return JaxGameEnvironment("catch", seed=3, max_noops=2)


def test_dm_env_contract_smoke():
  """Light-weight contract checks without absltest runner."""
  env = JaxGameEnvironment("catch", seed=3, max_noops=2)
  ts = env.reset()
  assert ts.first()
  rgb, lives = ts.observation
  assert rgb.shape == (210, 160, 3) and rgb.dtype == np.uint8
  assert int(lives) >= 1
  spec = env.action_spec()
  done = False
  for _ in range(120):  # catch falls 170 px at 2 px/raw-frame ≈ 85 frames
    ts = env.step(0)
    if ts.last():
      done = True
      assert ts.discount == 0.0
      break
  assert done


def test_processor_action_repeat_contract():
  """None → repeat previous action (ref processors_test.py:140-194)."""
  proc = processors.atari()
  env = JaxGameEnvironment("pong", seed=0, max_noops=1)
  ts = env.reset()
  out = proc(ts)
  assert out is not None and out.first()
  assert out.observation.shape == (84, 84, 4)
  nones = 0
  emits = 1
  for i in range(17):
    ts = env.step(0)
    out = proc(ts)
    if out is None:
      nones += 1
    else:
      emits += 1
      assert out.observation.dtype == np.uint8
      assert out.reward is not None
      assert abs(out.discount - 0.99) < 1e-9
  # after FIRST, every 4th step emits: 17 steps → 4 emits (at 4,8,12,16)
  assert emits == 1 + 4
  assert nones == 13


def test_processor_stacking_progression():
  proc = processors.atari()
  env = JaxGameEnvironment("pong", seed=1, max_noops=1)
  out = proc(env.reset())
  s0 = out.observation
  # FIRST stack: only channel 0 populated
  assert s0[..., 0].any()
  assert not s0[..., 1:].any()
  outs = [s0]
  for i in range(12):
    o = proc(env.step(2))
    if o is not None:
      outs.append(o.observation)
  assert outs[1][..., 1].any() and not outs[1][..., 2:].any()
  assert outs[3][..., 3].any()


def test_host_vs_device_prep_differential():
  """The host processor and the device prep produce (near-)identical
  observations for the same frames."""
  import jax.numpy as jnp
  from dqn_zoo_tpu import prep
  rng = np.random.RandomState(0)
  f1 = rng.randint(0, 256, (210, 160, 3), np.uint8)
  f2 = rng.randint(0, 256, (210, 160, 3), np.uint8)
  host = processors.AtariProcessor()._frame_to_obs([f1, f2])
  device = np.asarray(
      prep.pooled_frame_to_84(jnp.asarray(f1), jnp.asarray(f2)))
  diff = np.abs(host.astype(int) - device.astype(int))
  assert diff.mean() < 2.0
  assert (diff <= 6).mean() > 0.99


def test_epsilon_greedy_actor():
  import jax
  from dqn_zoo_tpu import nets
  net = nets.dqn_atari_network(3)
  sample = np.zeros((1, 84, 84, 4), np.uint8)
  params = net.init(jax.random.PRNGKey(0), sample)
  actor = parts.EpsilonGreedyActor(
      preprocessor=processors.atari(),
      network=net,
      exploration_epsilon=0.0,
      rng_key=jax.random.PRNGKey(1),
  )
  actor.network_params = params
  env = JaxGameEnvironment("catch", seed=0, max_noops=1)
  actor.reset()
  ts = env.reset()
  a = actor.step(ts)
  assert 0 <= a < 3
  # action repeat: None-timesteps repeat the same action
  a2 = actor.step(env.step(a))
  assert a2 == a
  state = actor.get_state()
  actor.set_state(state)
