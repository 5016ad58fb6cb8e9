"""Behavior tests for enduro (strategy as tests/test_new_games.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu.envs import VectorAtariEnv, get_game
from dqn_zoo_tpu.envs.games import enduro as en


def _state(key=0, speed=en.MAX_SPEED):
  state = en.enduro_init(jax.random.PRNGKey(key))
  # Park all traffic far ahead and center the player.
  return state._replace(
      speed=jnp.asarray(speed, jnp.float32),
      player_x=jnp.asarray(en.LANE_X[1], jnp.float32),
      car_z=jnp.full_like(state.car_z, en.SPAWN_AHEAD),
      car_lane=jnp.zeros_like(state.car_lane))


def test_vector_smoke():
  env = VectorAtariEnv(get_game("enduro"), batch_size=4)
  assert env.num_actions == 9
  state = env.init(jax.random.PRNGKey(0))
  step = jax.jit(env.step)
  key = jax.random.PRNGKey(1)
  frames = []
  for _ in range(10):
    key, k = jax.random.split(key)
    actions = jax.random.randint(k, (4,), 0, env.num_actions)
    state, out = step(state, actions)
    frames.append(np.asarray(out.frame_last))
  assert frames[-1].shape == (4, 210, 160, 3)
  assert frames[-1].sum() > 0
  assert not np.array_equal(frames[0], frames[-1])


def test_throttle_brake_and_steering():
  state = _state(speed=2.0)
  s_f, *_ = en.enduro_step(state, jnp.asarray(1))  # FIRE
  s_b, *_ = en.enduro_step(state, jnp.asarray(4))  # DOWN (brake)
  s_n, *_ = en.enduro_step(state, jnp.asarray(0))  # NOOP (drag only)
  assert float(s_f.speed) > float(state.speed)
  assert float(s_b.speed) < float(s_n.speed) < float(state.speed)
  s_r, *_ = en.enduro_step(state, jnp.asarray(2))
  s_l, *_ = en.enduro_step(state, jnp.asarray(3))
  assert float(s_r.player_x) > float(state.player_x)
  assert float(s_l.player_x) < float(state.player_x)


def test_clean_overtake_scores():
  state = _state()
  # One car just ahead in a DIFFERENT lane (player centered in lane 1,
  # car in lane 0): crossing below z=0 is a clean pass.
  state = state._replace(car_z=state.car_z.at[0].set(1.0))
  s2, reward, done, _ = en.enduro_step(state, jnp.asarray(1))
  assert float(reward) == 1.0
  assert int(s2.passed) == 1
  assert not bool(done)
  # The same car drifting back ahead of us (we slow to a stop) costs −1.
  s3 = s2._replace(speed=jnp.zeros((), jnp.float32),
                   car_z=s2.car_z.at[0].set(-1.0))
  _, reward, *_ = en.enduro_step(s3, jnp.asarray(0))
  assert float(reward) == -1.0


def test_collision_drops_speed_no_score():
  state = _state()
  # Car crossing our z in OUR lane (lane 1 under the player).
  state = state._replace(car_z=state.car_z.at[0].set(1.0),
                         car_lane=state.car_lane.at[0].set(1))
  s2, reward, *_ = en.enduro_step(state, jnp.asarray(1))
  assert float(reward) == 0.0
  assert abs(float(s2.speed) - en.CRASH_SPEED) < 1e-6
  assert float(s2.car_z[0]) > 0.0  # shoved back ahead of us


def test_episode_clock():
  state = _state()
  state = state._replace(frame=jnp.asarray(en.EPISODE_FRAMES - 1, jnp.int32))
  _, _, done, _ = en.enduro_step(state, jnp.asarray(0))
  assert bool(done)


def test_random_play_scores_about_zero():
  """Random play barely moves, so nothing gets overtaken (ALE random 0)."""
  env = VectorAtariEnv(get_game("enduro"), batch_size=16)
  state = env.init(jax.random.PRNGKey(2))
  step = jax.jit(env.step)
  key = jax.random.PRNGKey(3)
  total = 0.0
  for _ in range(200):
    key, k = jax.random.split(key)
    actions = jax.random.randint(k, (16,), 0, env.num_actions)
    state, out = step(state, actions)
    total += float(np.asarray(out.raw_reward_sum).sum())
  assert abs(total / 16) < 3.0


def test_full_throttle_outruns_traffic():
  """Held FIRE passes many cars: the human-anchor direction is reachable."""
  game = get_game("enduro")
  state = en.enduro_init(jax.random.PRNGKey(4))
  total = 0.0
  for i in range(600):
    # Steer away from the nearest ahead car's lane; otherwise hold FIRE.
    lane_x = float(np.asarray(
        jnp.asarray(en.LANE_X, jnp.float32)[state.car_lane[
            int(np.argmin(np.where(np.asarray(state.car_z) > 0,
                                   np.asarray(state.car_z), 1e9)))]]))
    px = float(state.player_x)
    action = 7 if lane_x <= px else 8  # RIGHTFIRE / LEFTFIRE away from it
    if abs(lane_x - px) > en.CAR_W:
      action = 1
    state, reward, done, _ = en.enduro_step(state, jnp.asarray(action))
    total += float(reward)
  assert total >= 5.0
