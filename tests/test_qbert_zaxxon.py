"""Behavior tests for qbert / zaxxon (same strategy as tests/test_envs.py:
mechanics probed at the single-game function level plus vectorized protocol
smoke and random-play anchor sanity, mirroring gym_atari_test.py's
per-game checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu.envs import VectorAtariEnv, get_game


def test_render_and_step_smoke():
  for name in ("qbert", "zaxxon"):
    env = VectorAtariEnv(get_game(name), batch_size=4)
    state = env.init(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(1)
    frames = []
    for _ in range(10):
      key, k = jax.random.split(key)
      actions = jax.random.randint(k, (4,), 0, env.num_actions)
      state, out = step(state, actions)
      frames.append(np.asarray(out.frame_last))
    frames = np.stack(frames)
    assert frames.shape[1:] == (4, 210, 160, 3)
    assert frames.sum() > 0
    assert not np.array_equal(frames[0], frames[-1])


# --- qbert -----------------------------------------------------------------


def _hop_frame(state):
  """Advance state.frame so the NEXT step is a hop boundary, with the apex
  already colored (as it is from frame 1 of any real episode)."""
  from dqn_zoo_tpu.envs.games import qbert as qb
  return state._replace(frame=jnp.asarray(qb.HOP_PERIOD - 1, jnp.int32),
                        colored=state.colored.at[0, 0].set(True))


def test_qbert_hop_colors_cube_and_scores():
  from dqn_zoo_tpu.envs.games import qbert as qb
  state = qb.qbert_init(jax.random.PRNGKey(0))
  state = _hop_frame(state)
  # RIGHT (action 3) = down-right hop from the apex: (0,0) -> (1,1).
  s2, reward, done, life_lost = qb.qbert_step(state, jnp.asarray(3))
  assert float(reward) == qb.CUBE_POINTS
  assert (int(s2.pr), int(s2.pc)) == (1, 1)
  assert bool(s2.colored[1, 1])
  assert not bool(done) and not bool(life_lost)
  # Hopping back onto a colored cube scores nothing.
  s2 = _hop_frame(s2)
  s3, reward, _, _ = qb.qbert_step(s2, jnp.asarray(4))  # up-left -> apex
  assert (int(s3.pr), int(s3.pc)) == (0, 0)
  assert float(reward) == 0.0


def test_qbert_hop_off_pyramid_costs_life():
  from dqn_zoo_tpu.envs.games import qbert as qb
  state = qb.qbert_init(jax.random.PRNGKey(0))
  state = _hop_frame(state)
  # UP (action 2) from the apex leaves the pyramid.
  s2, reward, done, life_lost = qb.qbert_step(state, jnp.asarray(2))
  assert float(reward) == 0.0
  assert int(s2.lives) == qb.LIVES - 1
  assert bool(life_lost) and not bool(done)
  assert (int(s2.pr), int(s2.pc)) == (0, 0)  # respawned at the apex
  assert int(s2.freeze) > 0


def test_qbert_board_completion_bonus_and_refresh():
  from dqn_zoo_tpu.envs.games import qbert as qb
  state = qb.qbert_init(jax.random.PRNGKey(0))
  tri = np.tril(np.ones((qb.N, qb.N), bool))
  colored = tri.copy()
  colored[1, 1] = False  # everything but the hop target
  state = state._replace(colored=jnp.asarray(colored))
  state = _hop_frame(state)
  s2, reward, done, _ = qb.qbert_step(state, jnp.asarray(3))
  assert float(reward) == qb.CUBE_POINTS + qb.ROUND_BONUS
  assert not bool(s2.colored[3, 2])  # board refreshed
  assert not bool(done)


def test_qbert_coily_contact_costs_life():
  from dqn_zoo_tpu.envs.games import qbert as qb
  state = qb.qbert_init(jax.random.PRNGKey(0))
  state = state._replace(pr=jnp.asarray(3, jnp.int32),
                         pc=jnp.asarray(1, jnp.int32),
                         cr=jnp.asarray(3, jnp.int32),
                         cc=jnp.asarray(1, jnp.int32))
  s2, _, done, life_lost = qb.qbert_step(state, jnp.asarray(0))
  assert bool(life_lost) and not bool(done)
  assert int(s2.lives) == qb.LIVES - 1
  assert int(s2.cr) == -1  # Coily despawned


def test_qbert_game_over_on_last_life():
  from dqn_zoo_tpu.envs.games import qbert as qb
  state = qb.qbert_init(jax.random.PRNGKey(0))
  state = state._replace(lives=jnp.asarray(1, jnp.int32))
  state = _hop_frame(state)
  s2, _, done, life_lost = qb.qbert_step(state, jnp.asarray(2))  # fall
  assert bool(done) and not bool(life_lost)


# --- zaxxon ----------------------------------------------------------------


def test_zaxxon_shot_kills_drone_and_scores():
  from dqn_zoo_tpu.envs.games import zaxxon as zx
  state = zx.zaxxon_init(jax.random.PRNGKey(0))
  # Park a drone directly ahead, shot already in flight about to overlap.
  state = state._replace(
      enemy_x=state.enemy_x.at[0].set(100.0),
      enemy_y=state.enemy_y.at[0].set(float(state.ship_y)),
      enemy_turret=state.enemy_turret.at[0].set(False),
      enemy_alive=state.enemy_alive.at[0].set(True),
      shot_x=jnp.asarray(95.0, jnp.float32),
      shot_y=jnp.asarray(float(state.ship_y) + 2.0, jnp.float32),
      wall_x=jnp.asarray(500.0, jnp.float32))
  s2, reward, done, _ = zx.zaxxon_step(state, jnp.asarray(0))
  assert float(reward) == zx.DRONE_POINTS
  assert float(s2.shot_x) < 0  # shot consumed
  assert not bool(done)


def test_zaxxon_turret_scores_more():
  from dqn_zoo_tpu.envs.games import zaxxon as zx
  state = zx.zaxxon_init(jax.random.PRNGKey(0))
  state = state._replace(
      enemy_x=state.enemy_x.at[0].set(100.0),
      enemy_y=state.enemy_y.at[0].set(120.0),
      enemy_turret=state.enemy_turret.at[0].set(True),
      enemy_alive=state.enemy_alive.at[0].set(True),
      shot_x=jnp.asarray(95.0, jnp.float32),
      shot_y=jnp.asarray(122.0, jnp.float32),
      wall_x=jnp.asarray(500.0, jnp.float32))
  _, reward, _, _ = zx.zaxxon_step(state, jnp.asarray(0))
  assert float(reward) == zx.TURRET_POINTS


def test_zaxxon_wall_outside_gap_costs_life_inside_gap_safe():
  from dqn_zoo_tpu.envs.games import zaxxon as zx
  state = zx.zaxxon_init(jax.random.PRNGKey(0))
  state = state._replace(
      wall_x=jnp.asarray(zx.SHIP_X + 2.0, jnp.float32),
      gap_y=jnp.asarray(60.0, jnp.float32),
      ship_y=jnp.asarray(140.0, jnp.float32),  # far from the gap
      enemy_x=state.enemy_x + 500.0)
  s2, _, done, life_lost = zx.zaxxon_step(state, jnp.asarray(0))
  assert bool(life_lost) and not bool(done)
  assert int(s2.lives) == zx.LIVES - 1

  # Same wall, ship centered in the gap: safe.
  state = state._replace(ship_y=jnp.asarray(60.0 - zx.SHIP_H / 2,
                                            jnp.float32))
  s3, _, done, life_lost = zx.zaxxon_step(state, jnp.asarray(0))
  assert not bool(life_lost) and not bool(done)
  assert int(s3.lives) == zx.LIVES


def test_zaxxon_vertical_movement_decode():
  from dqn_zoo_tpu.envs.games import zaxxon as zx
  state = zx.zaxxon_init(jax.random.PRNGKey(0))
  y0 = float(state.ship_y)
  s_up, _, _, _ = zx.zaxxon_step(state, jnp.asarray(2))  # UP
  s_dn, _, _, _ = zx.zaxxon_step(state, jnp.asarray(5))  # DOWN
  assert float(s_up.ship_y) < y0 < float(s_dn.ship_y)
  # UPFIRE (10) both climbs and fires.
  s_uf, _, _, _ = zx.zaxxon_step(state, jnp.asarray(10))
  assert float(s_uf.ship_y) < y0
  assert float(s_uf.shot_x) >= 0


def test_random_play_near_ale_anchors():
  """qbert anchor 163.9, zaxxon 32.5 (atari_data.py:42-102): random play
  must land the normalized score near 0 (|norm| < 0.05)."""
  from dqn_zoo_tpu.run.atari_data import get_human_normalized_score
  for name in ("qbert", "zaxxon"):
    B = 16
    env = VectorAtariEnv(get_game(name), batch_size=B)
    state = env.init(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(3)
    total = np.zeros(B)
    ended = np.zeros(B, bool)
    for _ in range(2000):
      key, k = jax.random.split(key)
      actions = jax.random.randint(k, (B,), 0, env.num_actions)
      state, out = step(state, actions)
      total += np.asarray(out.raw_reward_sum) * ~ended
      ended |= np.asarray(out.is_last)
      if ended.all():
        break
    norm = get_human_normalized_score(name, total.mean())
    assert abs(norm) < 0.05, (name, total.mean(), norm)
