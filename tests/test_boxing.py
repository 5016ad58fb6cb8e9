"""Behavior tests for boxing (strategy as tests/test_new_games.py: mechanics
at the single-game function level + vectorized protocol smoke, mirroring
gym_atari_test.py's per-game checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu.envs import VectorAtariEnv, get_game
from dqn_zoo_tpu.envs.games import boxing as bx


def _in_range_state(key=0):
  """Player and enemy vertically aligned and just inside punching reach."""
  state = bx.boxing_init(jax.random.PRNGKey(key))
  y = (bx.RING_TOP + bx.RING_BOTTOM) / 2 - bx.BOXER_H / 2
  state = state._replace(
      px=jnp.asarray(70.0, jnp.float32),
      py=jnp.asarray(y, jnp.float32),
      ex=jnp.asarray(70.0 + bx.BOXER_W + bx.REACH - 2.0, jnp.float32),
      ey=jnp.asarray(y, jnp.float32),
      e_cool=jnp.asarray(bx.COOLDOWN, jnp.int32),  # enemy can't counter
  )
  return state


def test_vector_smoke():
  env = VectorAtariEnv(get_game("boxing"), batch_size=4)
  assert env.num_actions == 18
  state = env.init(jax.random.PRNGKey(0))
  step = jax.jit(env.step)
  key = jax.random.PRNGKey(1)
  last = None
  for _ in range(12):
    key, k = jax.random.split(key)
    actions = jax.random.randint(k, (4,), 0, env.num_actions)
    state, out = step(state, actions)
    assert out.frame_last.shape == (4, 210, 160, 3)
    last = np.asarray(out.frame_last)
  assert last.sum() > 0


def test_punch_in_range_scores():
  state = _in_range_state()
  s2, reward, done, life_lost = bx.boxing_step(state, jnp.asarray(1))  # FIRE
  assert float(reward) == 1.0
  assert int(s2.p_hits) == 1
  assert not bool(done) and not bool(life_lost)
  # Landing shoves the enemy back out of range.
  assert float(s2.ex) > float(state.ex)
  # Cooldown: an immediate second FIRE cannot land.
  s3, reward, *_ = bx.boxing_step(s2, jnp.asarray(1))
  assert float(reward) <= 0.0
  assert int(s3.p_hits) == 1


def test_punch_out_of_range_misses():
  state = _in_range_state()
  state = state._replace(ex=jnp.asarray(float(state.px) + bx.BOXER_W
                                        + bx.REACH + 10.0, jnp.float32))
  _, reward, *_ = bx.boxing_step(state, jnp.asarray(1))
  assert float(reward) == 0.0


def test_enemy_counterpunch_costs_a_point():
  state = _in_range_state()
  state = state._replace(e_cool=jnp.zeros((), jnp.int32))
  # NOOP until the enemy's stochastic feint gate fires.
  total = 0.0
  for _ in range(30):
    state, reward, done, _ = bx.boxing_step(state, jnp.asarray(0))
    total += float(reward)
    if total < 0:
      break
  assert total < 0
  assert int(state.e_hits) >= 1


def test_movement_decode_and_ring_bounds():
  state = _in_range_state()
  s_r, *_ = bx.boxing_step(state, jnp.asarray(3))  # RIGHT
  s_l, *_ = bx.boxing_step(state, jnp.asarray(4))  # LEFT
  s_u, *_ = bx.boxing_step(state, jnp.asarray(2))  # UP
  assert float(s_r.px) > float(state.px)
  assert float(s_l.px) < float(state.px)
  assert float(s_u.py) < float(state.py)
  # Walls clamp.
  state = state._replace(px=jnp.asarray(bx.RING_LEFT, jnp.float32))
  s_w, *_ = bx.boxing_step(state, jnp.asarray(4))
  assert float(s_w.px) == bx.RING_LEFT


def test_bout_clock_and_ko_end_episode():
  state = _in_range_state()
  state = state._replace(frame=jnp.asarray(bx.EPISODE_FRAMES - 1, jnp.int32))
  _, _, done, _ = bx.boxing_step(state, jnp.asarray(0))
  assert bool(done)
  state = _in_range_state()
  state = state._replace(p_hits=jnp.asarray(bx.KO_HITS - 1, jnp.int32))
  _, reward, done, _ = bx.boxing_step(state, jnp.asarray(1))
  assert float(reward) == 1.0 and bool(done)


def test_random_play_nets_about_zero():
  """Random policy lands about as many as it takes (ALE random ≈ 0.1)."""
  env = VectorAtariEnv(get_game("boxing"), batch_size=16)
  state = env.init(jax.random.PRNGKey(2))
  step = jax.jit(env.step)
  key = jax.random.PRNGKey(3)
  total = 0.0
  steps = 250  # 1000 raw frames per env
  for _ in range(steps):
    key, k = jax.random.split(key)
    actions = jax.random.randint(k, (16,), 0, env.num_actions)
    state, out = step(state, actions)
    total += float(np.asarray(out.raw_reward_sum).sum())
  per_episode = total / 16 * (bx.EPISODE_FRAMES / (steps * 4))
  assert -8.0 < per_episode < 8.0


def test_farm_enemy_visible_in_observation():
  """The farm's draw_rect max-blends, so the enemy must be drawn ABOVE the
  mat luma to appear at all (round-3 advisor finding: a luma-20 enemy over
  the luma-90 mat rendered the opponent completely invisible — the game's
  scoring depends on range/timing play against it)."""
  from dqn_zoo_tpu.envs.cpp_bridge import CppVectorEnv
  env = CppVectorEnv("boxing", batch_size=2, seed=0, num_threads=1)
  out = env.step(np.zeros(2, np.int32))
  # Enemy starts at x≈104-112, y≈89-143 (210x160 world) → a bright block
  # near cols 45-65 / rows 33-60 of the 84x84 frame; the mat there is 90
  # and the ropes (150) lie outside this window.
  window = out.obs84[:, 33:60, 45:65]
  assert (window.max(axis=(1, 2)) >= 140).all(), window.max(axis=(1, 2))
  env.close()
