"""Behavior tests for tennis / gopher (same strategy as the other
round-4 game test files)."""

import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu.envs import VectorAtariEnv, get_game


def test_render_and_step_smoke():
  for name in ("tennis", "gopher"):
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


# --- tennis ----------------------------------------------------------------


def test_tennis_unreturned_ball_is_opponent_point():
  from dqn_zoo_tpu.envs.games import tennis as tn
  state = tn.tennis_init(jax.random.PRNGKey(0))
  # Ball about to cross the player's baseline, paddle far away.
  state = state._replace(
      serve_timer=jnp.asarray(0, jnp.int32),
      bx=jnp.asarray(30.0, jnp.float32),
      by=jnp.asarray(tn.COURT_BOT - 1.0, jnp.float32),
      bvx=jnp.asarray(0.0, jnp.float32),
      bvy=jnp.asarray(tn.BALL_SPEED_Y, jnp.float32),
      px=jnp.asarray(120.0, jnp.float32))
  s, r, done, _ = tn.tennis_step(state, jnp.asarray(0))
  assert float(r) == -1.0
  assert int(s.points) == 1
  assert int(s.serve_timer) == tn.SERVE_DELAY
  assert not bool(s.serve_to_player)
  assert not bool(done)


def test_tennis_player_return_reverses_ball():
  from dqn_zoo_tpu.envs.games import tennis as tn
  state = tn.tennis_init(jax.random.PRNGKey(0))
  state = state._replace(
      serve_timer=jnp.asarray(0, jnp.int32),
      bx=jnp.asarray(80.0, jnp.float32),
      by=jnp.asarray(tn.PLAYER_Y - 1.0, jnp.float32),
      bvx=jnp.asarray(0.5, jnp.float32),
      bvy=jnp.asarray(tn.BALL_SPEED_Y, jnp.float32),
      px=jnp.asarray(80.0, jnp.float32))
  s, r, _, _ = tn.tennis_step(state, jnp.asarray(0))
  assert float(r) == 0.0
  assert float(s.bvy) < 0  # heading back over the net


def test_tennis_set_ends_after_24_points():
  from dqn_zoo_tpu.envs.games import tennis as tn
  state = tn.tennis_init(jax.random.PRNGKey(0))
  state = state._replace(
      points=jnp.asarray(23, jnp.int32),
      serve_timer=jnp.asarray(0, jnp.int32),
      bx=jnp.asarray(30.0, jnp.float32),
      by=jnp.asarray(tn.COURT_BOT - 1.0, jnp.float32),
      bvy=jnp.asarray(tn.BALL_SPEED_Y, jnp.float32),
      px=jnp.asarray(120.0, jnp.float32))
  s, _, done, _ = tn.tennis_step(state, jnp.asarray(0))
  assert bool(done)


# --- gopher ----------------------------------------------------------------


def test_gopher_fill_hole_scores():
  from dqn_zoo_tpu.envs.games import gopher as gp
  state = gp.gopher_init(jax.random.PRNGKey(0))
  state = state._replace(
      holes=state.holes.at[8].set(2),
      fx=jnp.asarray(85.0, jnp.float32))  # cell 8
  s, r, _, _ = gp.gopher_step(state, jnp.asarray(1))  # FIRE
  assert float(r) == gp.FILL_POINTS
  assert int(s.holes[8]) == 0


def test_gopher_bonk_scores_and_resets_gopher():
  from dqn_zoo_tpu.envs.games import gopher as gp
  state = gp.gopher_init(jax.random.PRNGKey(0))
  state = state._replace(
      gcell=jnp.asarray(8, jnp.int32),
      popped=jnp.asarray(10, jnp.int32),
      fx=jnp.asarray(85.0, jnp.float32))
  s, r, _, _ = gp.gopher_step(state, jnp.asarray(1))
  assert float(r) == gp.BONK_POINTS
  assert int(s.gcell) in (0, gp.CELLS - 1)
  assert int(s.popped) == 0


def test_gopher_carrots_eaten_ends_episode():
  from dqn_zoo_tpu.envs.games import gopher as gp
  state = gp.gopher_init(jax.random.PRNGKey(0))
  # Gopher parked at the last carrot with a fully open hole, two carrots
  # already gone; next dig tick eats it.
  state = state._replace(
      carrots=jnp.asarray([False, True, False]),
      gcell=jnp.asarray(gp.CARROT_CELLS[1], jnp.int32),
      holes=state.holes.at[gp.CARROT_CELLS[1]].set(gp.HOLE_DEPTH),
      frame=jnp.asarray(gp.DIG_EVERY - 1, jnp.int32))
  s, _, done, _ = gp.gopher_step(state, jnp.asarray(0))
  assert not bool(s.carrots.any())
  assert bool(done)


def test_random_play_near_ale_anchors():
  """tennis anchor -23.8, gopher 257.7 (atari_data.py:42-102)."""
  from dqn_zoo_tpu.run.atari_data import get_human_normalized_score
  for name, band in (("tennis", 0.08), ("gopher", 0.12)):
    B = 16
    env = VectorAtariEnv(get_game(name), batch_size=B)
    state = env.init(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(3)
    total = np.zeros(B)
    ended = np.zeros(B, bool)
    for _ in range(6000):
      key, k = jax.random.split(key)
      actions = jax.random.randint(k, (B,), 0, env.num_actions)
      state, out = step(state, actions)
      total += np.asarray(out.raw_reward_sum) * ~ended
      ended |= np.asarray(out.is_last)
      if ended.all():
        break
    norm = get_human_normalized_score(name, total.mean())
    assert abs(norm) < band, (name, total.mean(), norm)


def test_farm_protocol_and_scoring():
  from dqn_zoo_tpu.envs.cpp_bridge import CppVectorEnv
  rng = np.random.RandomState(0)

  env = CppVectorEnv("tennis", batch_size=4, seed=13)
  assert env.num_actions == 18
  total = 0.0
  for _ in range(600):
    out = env.step(rng.randint(0, 18, 4).astype(np.int32))
    total += float(np.sum(out.reward_sum))
  env.close()
  assert total < 0  # the tracking opponent wins nearly every point

  env = CppVectorEnv("gopher", batch_size=4, seed=14)
  assert env.num_actions == 8
  total = 0.0
  for _ in range(800):
    out = env.step(rng.randint(0, 8, 4).astype(np.int32))
    total += float(np.sum(out.reward_sum))
  env.close()
  assert total > 0  # random fills holes by accident
