"""Behavior tests for asterix / atlantis / skiing (same strategy as
tests/test_envs.py: mechanics probed at the single-game function level plus
vectorized protocol smoke, mirroring gym_atari_test.py's per-game checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu.envs import VectorAtariEnv, get_game


def vector_smoke(name, steps=60, batch=4):
  env = VectorAtariEnv(get_game(name), batch_size=batch)
  state = env.init(jax.random.PRNGKey(0))
  step = jax.jit(env.step)
  key = jax.random.PRNGKey(1)
  frames = []
  for _ in range(steps):
    key, k = jax.random.split(key)
    actions = jax.random.randint(k, (batch,), 0, env.num_actions)
    state, out = step(state, actions)
    frames.append(np.asarray(out.frame_last))
  return np.stack(frames)


def test_new_games_render_and_step():
  for name in ("asterix", "atlantis", "skiing"):
    frames = vector_smoke(name, steps=10)
    assert frames.shape[1:] == (4, 210, 160, 3)
    assert frames.sum() > 0
    # Motion: consecutive frames differ.
    assert not np.array_equal(frames[0], frames[-1])


# --- asterix ---------------------------------------------------------------


def test_asterix_collect_scores_and_lyre_costs_life():
  from dqn_zoo_tpu.envs.games import asterix as ax
  state = ax.asterix_init(jax.random.PRNGKey(0))
  # Plant a collectible exactly on the player.
  state = state._replace(
      obj_x=state.obj_x.at[:].set(-100.0),
      obj_live=jnp.ones_like(state.obj_live),
      obj_is_lyre=jnp.zeros_like(state.obj_is_lyre))
  lane = 4
  lane_y = float(ax._lane_tops()[lane])
  state = state._replace(
      player_y=jnp.asarray(lane_y, jnp.float32),
      obj_x=state.obj_x.at[lane].set(state.player_x))
  s2, reward, done, life_lost = ax.asterix_step(state, jnp.asarray(0))
  assert float(reward) == ax.POINTS
  assert not bool(done) and not bool(life_lost)
  assert not bool(s2.obj_live[lane])  # consumed

  # Same geometry but a lyre: life lost, no points.
  state = state._replace(
      obj_is_lyre=state.obj_is_lyre.at[lane].set(True))
  s3, reward, done, life_lost = ax.asterix_step(state, jnp.asarray(0))
  assert float(reward) == 0.0
  assert bool(life_lost) and not bool(done)
  assert int(s3.lives) == ax.LIVES - 1

  # Out of lives → done, no life_lost signal (terminal instead).
  state = state._replace(lives=jnp.asarray(1, jnp.int32))
  _, _, done, life_lost = ax.asterix_step(state, jnp.asarray(0))
  assert bool(done) and not bool(life_lost)


def test_asterix_eight_direction_movement():
  from dqn_zoo_tpu.envs.games import asterix as ax
  state = ax.asterix_init(jax.random.PRNGKey(1))
  state = state._replace(obj_live=jnp.zeros_like(state.obj_live))
  x0, y0 = float(state.player_x), float(state.player_y)
  moved = {}
  for action, (ex, ey) in {1: (0, -1), 2: (1, 0), 5: (1, -1),
                           8: (-1, 1)}.items():
    s, *_ = ax.asterix_step(state, jnp.asarray(action))
    moved[action] = (np.sign(float(s.player_x) - x0),
                     np.sign(float(s.player_y) - y0))
    assert moved[action] == (ex, ey), action


# --- atlantis --------------------------------------------------------------


def test_atlantis_center_gun_downs_ship_on_beam():
  from dqn_zoo_tpu.envs.games import atlantis as at
  state = at.atlantis_init(jax.random.PRNGKey(0))
  slot = 2
  state = state._replace(
      ship_live=jnp.zeros_like(state.ship_live).at[slot].set(True),
      ship_x=state.ship_x.at[slot].set(at.CENTER_GUN_X - at.SHIP_W / 2),
      ship_band=state.ship_band.at[slot].set(3))
  s2, reward, done, _ = at.atlantis_step(state, jnp.asarray(1))  # FIRE
  assert float(reward) == 400.0  # band 3 → 100·4
  assert not bool(s2.ship_live[slot])
  assert not bool(done)
  # NOOP with the same geometry scores nothing.
  _, r0, _, _ = at.atlantis_step(state, jnp.asarray(0))
  assert float(r0) == 0.0


def test_atlantis_death_ray_and_game_over():
  from dqn_zoo_tpu.envs.games import atlantis as at
  state = at.atlantis_init(jax.random.PRNGKey(0))
  # A band-0 ship exiting the screen fires the death ray.
  state = state._replace(
      ship_live=jnp.zeros_like(state.ship_live).at[0].set(True),
      ship_band=state.ship_band.at[0].set(0),
      ship_dir=state.ship_dir.at[0].set(1.0),
      ship_x=state.ship_x.at[0].set(160.5))
  s2, _, done, _ = at.atlantis_step(state, jnp.asarray(0))
  assert int(s2.city_live.sum()) == at.NUM_CITY - 1
  assert not bool(done)
  # Last city falls → game over.
  state = state._replace(
      city_live=jnp.zeros_like(state.city_live).at[0].set(True))
  s3, _, done, _ = at.atlantis_step(state, jnp.asarray(0))
  assert bool(done) and int(s3.city_live.sum()) == 0


# --- skiing ----------------------------------------------------------------


def test_skiing_terminal_reward_time_plus_misses():
  from dqn_zoo_tpu.envs.games import skiing as sk
  state = sk.skiing_init(jax.random.PRNGKey(0))
  # Warp to just above the finish with all gates judged+passed.
  state = state._replace(
      course_y=jnp.asarray(sk.COURSE_LEN - 1.0, jnp.float32),
      gate_passed=jnp.ones_like(state.gate_passed),
      gate_judged=jnp.ones_like(state.gate_judged),
      frames=jnp.asarray(2000, jnp.int32))
  _, reward, done, _ = sk.skiing_step(state, jnp.asarray(0))
  assert bool(done)
  np.testing.assert_allclose(float(reward), -(2001 * 100.0 / 60.0),
                             rtol=1e-5)
  # Same but all gates missed: 500 cs penalty each.
  state = state._replace(gate_passed=jnp.zeros_like(state.gate_passed))
  _, reward, done, _ = sk.skiing_step(state, jnp.asarray(0))
  assert bool(done)
  np.testing.assert_allclose(
      float(reward), -(2001 * 100.0 / 60.0 + 500.0 * sk.NUM_GATES),
      rtol=1e-5)


def test_skiing_gate_judging_and_speed():
  from dqn_zoo_tpu.envs.games import skiing as sk
  state = sk.skiing_init(jax.random.PRNGKey(2))
  gate0_y = float((1.0) * sk.GATE_SPACING)
  # Just above gate 0, aligned with it → straight descent judges it passed.
  state = state._replace(
      course_y=jnp.asarray(gate0_y - 2.0, jnp.float32),
      skier_x=state.gate_x[0])
  s2, _, _, _ = sk.skiing_step(state, jnp.asarray(0))
  assert bool(s2.gate_judged[0]) and bool(s2.gate_passed[0])
  # Far from the gate → judged but missed.
  state = state._replace(
      skier_x=jnp.clip(state.gate_x[0] + 50.0, sk.SKIER_X_MIN,
                       sk.SKIER_X_MAX))
  s3, _, _, _ = sk.skiing_step(state, jnp.asarray(0))
  assert bool(s3.gate_judged[0]) and not bool(s3.gate_passed[0])
  # Turning is slower than straight descent.
  straight, _, _, _ = sk.skiing_step(state, jnp.asarray(0))
  turning, _, _, _ = sk.skiing_step(state, jnp.asarray(1))
  assert float(straight.course_y) > float(turning.course_y)


def test_random_play_score_scale_sanity():
  """Random-play raw returns land in a plausible band relative to the
  reference anchors (atari_data.py): asterix O(100s), atlantis O(1000s)."""
  for name, lo, hi in (("asterix", 0.0, 2500.0), ("atlantis", 0.0, 4e4)):
    env = VectorAtariEnv(get_game(name), batch_size=8)
    state = env.init(jax.random.PRNGKey(4))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(5)
    total = np.zeros(8)
    for _ in range(150):
      key, k = jax.random.split(key)
      actions = jax.random.randint(k, (8,), 0, env.num_actions)
      state, out = step(state, actions)
      total += np.asarray(out.raw_reward_sum)
    assert lo <= total.mean() <= hi, (name, total.mean())
