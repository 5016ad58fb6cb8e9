"""C++ env farm tests: build, protocol, determinism, host-env engine."""

import numpy as np
import pytest

from dqn_zoo_tpu.envs.cpp_bridge import CppVectorEnv


def test_farm_basic_protocol():
  env = CppVectorEnv("catch", batch_size=8, seed=0, num_threads=2,
                     episode_frame_cap=1000)
  assert env.num_actions == 3
  out = env.step(np.zeros(8, np.int32))
  assert out.is_first.all()
  assert out.obs84.shape == (8, 84, 84)
  assert out.obs84.dtype == np.uint8
  assert out.obs84.sum() > 0
  lasts_seen = np.zeros(8, bool)
  for i in range(40):
    out = env.step(np.random.randint(0, 3, 8).astype(np.int32))
    lasts_seen |= out.is_last
  assert lasts_seen.all()
  env.close()


def test_farm_determinism_same_seed():
  def rollout(seed):
    env = CppVectorEnv("pong", batch_size=4, seed=seed, num_threads=2)
    obs = []
    for i in range(20):
      out = env.step(np.full(4, i % 6, np.int32))
      obs.append(out.obs84.copy())
    env.close()
    return np.stack(obs)

  a, b, c = rollout(7), rollout(7), rollout(8)
  np.testing.assert_array_equal(a, b)
  assert not np.array_equal(a, c)


def test_farm_breakout_lives_and_life_loss():
  env = CppVectorEnv("breakout", batch_size=8, seed=1, num_threads=2,
                     episode_frame_cap=100000)
  lives_prev = None
  found_life_loss = False
  for i in range(400):
    out = env.step(np.random.randint(0, 4, 8).astype(np.int32))
    if lives_prev is not None:
      for b in range(8):
        if (not out.is_first[b] and out.lives[b] < lives_prev[b]
            and out.lives[b] > 0):
          assert out.discount_prod[b] == 0.0
          found_life_loss = True
    lives_prev = out.lives.copy()
  assert found_life_loss
  env.close()


def test_farm_truncation():
  env = CppVectorEnv("pong", batch_size=2, seed=0, num_threads=1,
                     episode_frame_cap=40)
  truncated = False
  for i in range(15):
    out = env.step(np.zeros(2, np.int32))
    if out.is_truncated.any():
      truncated = True
      b = np.argmax(out.is_truncated)
      assert out.is_last[b]
      assert out.discount_prod[b] == 1.0  # truncation bootstraps
      break
  assert truncated
  env.close()


def test_host_env_engine_learns_catch():
  import jax
  from dqn_zoo_tpu.agents import get_agent
  from dqn_zoo_tpu.engine import EngineConfig
  from dqn_zoo_tpu.engine.host_env import HostEnvEngine
  from dqn_zoo_tpu.envs.vector import VectorEnvConfig

  cfg = EngineConfig(
      agent=get_agent("dqn"),
      game="catch",
      num_envs=8,
      slots_per_stream=64,
      batch_size=16,
      total_train_frames=100_000,
      env_config=VectorEnvConfig(episode_frame_cap=1000),
  )
  env = CppVectorEnv("catch", batch_size=8, seed=0, num_threads=2,
                     episode_frame_cap=1000)
  eng = HostEnvEngine(cfg, env)
  state = eng.init(jax.random.PRNGKey(0))
  state = eng.run(state, 60)
  m = eng.metrics(state)
  assert m["env_frames"] > 0
  assert m["episodes"] > 0
  assert m["learn_steps"] > 0
  assert np.isfinite(m["last_loss"])
  env.close()


def test_new_games_score_under_greedy_policy():
  """space_invaders: constant FIRE hits aliens; freeway: constant UP
  crosses. Mirrors the JAX-game tests in test_envs.py."""
  for game, acts, greedy in [("space_invaders", 6, 1), ("freeway", 3, 1)]:
    env = CppVectorEnv(game, batch_size=4, seed=7)
    assert env.num_actions == acts
    total = 0.0
    for _ in range(300):
      out = env.step(np.full((4,), greedy, np.int32))
      total += float(np.sum(out.reward_sum))
    env.close()
    assert total > 0, f"{game}: greedy policy never scored"


def test_round3_games_protocol_and_scoring():
  """asterix / atlantis / skiing in the farm: action-set sizes match the
  JAX games; random play scores in asterix+atlantis; skiing pays its
  one-shot terminal time penalty (games/skiing.py reward contract)."""
  rng = np.random.RandomState(0)
  for game, acts in [("asterix", 9), ("atlantis", 4)]:
    env = CppVectorEnv(game, batch_size=4, seed=11)
    assert env.num_actions == acts
    total = 0.0
    for _ in range(400):
      out = env.step(rng.randint(0, acts, 4).astype(np.int32))
      total += float(np.sum(out.reward_sum))
    env.close()
    assert total > 0, f"{game}: random play never scored"

  env = CppVectorEnv("skiing", batch_size=2, seed=3)
  assert env.num_actions == 3
  terminal_rewards = []
  for _ in range(900):  # straight descent: 6000/3 raw frames / 4 repeat
    out = env.step(np.zeros((2,), np.int32))
    r = np.asarray(out.reward_sum)
    terminal_rewards.extend(r[np.asarray(out.is_last)].tolist())
  env.close()
  assert terminal_rewards, "skiing never finished a run"
  # Time-only component ≈ −(2000+ frames × 5/3 cs); misses add −500 each.
  assert all(-17000.0 < r <= -3000.0 for r in terminal_rewards), \
      terminal_rewards


def test_round3b_games_protocol_and_scoring():
  """boxing / enduro / ms_pacman in the farm: action-set sizes match the
  JAX games and their reward channels are live (same strategy as
  test_round3_games_protocol_and_scoring)."""
  rng = np.random.RandomState(0)

  # ms_pacman: random play eats pellets — strictly positive score.
  env = CppVectorEnv("ms_pacman", batch_size=4, seed=5)
  assert env.num_actions == 9
  total = 0.0
  for _ in range(300):
    out = env.step(rng.randint(0, 9, 4).astype(np.int32))
    total += float(np.sum(out.reward_sum))
  env.close()
  assert total > 0

  # boxing: punches land in both directions — reward events occur.
  env = CppVectorEnv("boxing", batch_size=4, seed=6)
  assert env.num_actions == 18
  events = 0
  for _ in range(400):
    out = env.step(rng.randint(0, 18, 4).astype(np.int32))
    events += int(np.sum(np.abs(np.asarray(out.reward_sum)) > 0))
  env.close()
  assert events > 0

  # enduro: held throttle from the center lane nets clean overtakes.
  env = CppVectorEnv("enduro", batch_size=4, seed=7)
  assert env.num_actions == 9
  total = 0.0
  for _ in range(600):
    out = env.step(np.ones((4,), np.int32))  # FIRE
    total += float(np.sum(out.reward_sum))
  env.close()
  assert total > 0


def test_round4_games_protocol_and_scoring():
  """qbert / zaxxon in the farm: action-set sizes match the JAX games and
  their reward channels are live (same strategy as the round-3 tests)."""
  rng = np.random.RandomState(0)

  # qbert: random hops color cubes — positive score (spawn cube + hops).
  env = CppVectorEnv("qbert", batch_size=4, seed=8)
  assert env.num_actions == 6
  total = 0.0
  lasts = 0
  for _ in range(400):
    out = env.step(rng.randint(0, 6, 4).astype(np.int32))
    total += float(np.sum(out.reward_sum))
    lasts += int(np.sum(out.is_last))
  env.close()
  assert total > 0
  assert lasts > 0  # random play falls off and exhausts 4 lives

  # zaxxon: constant FIRE while holding center kills some drones.
  env = CppVectorEnv("zaxxon", batch_size=8, seed=9)
  assert env.num_actions == 18
  total = 0.0
  for _ in range(500):
    out = env.step(np.ones((8,), np.int32))  # FIRE
    total += float(np.sum(out.reward_sum))
  env.close()
  assert total > 0
