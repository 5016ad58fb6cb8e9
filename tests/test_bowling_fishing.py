"""Behavior tests for bowling / fishing_derby (same strategy as
tests/test_qbert_zaxxon.py: single-game mechanics probes, vectorized smoke,
normalized-anchor sanity, farm protocol parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu.envs import VectorAtariEnv, get_game


def test_render_and_step_smoke():
  for name in ("bowling", "fishing_derby"):
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


# --- bowling ---------------------------------------------------------------


def test_bowling_center_roll_fells_pins_and_scores():
  from dqn_zoo_tpu.envs.games import bowling as bw
  state = bw.bowling_init(jax.random.PRNGKey(0))
  s, r, done, _ = bw.bowling_step(state, jnp.asarray(1))  # FIRE
  assert float(s.ball_x) > 0
  total = float(r)
  for _ in range(60):
    s, r, done, _ = bw.bowling_step(s, jnp.asarray(0))
    total += float(r)
    if float(s.ball_x) < 0:
      break
  assert total > 0  # a center-line roll hits the head-on pin column
  assert int(s.roll_no) in (0, 1)
  assert not bool(done)


def test_bowling_roll_without_release_goes_nowhere():
  from dqn_zoo_tpu.envs.games import bowling as bw
  state = bw.bowling_init(jax.random.PRNGKey(0))
  s, r, _, _ = bw.bowling_step(state, jnp.asarray(0))  # NOOP: no release
  assert float(s.ball_x) < 0 and float(r) == 0.0
  # Aim moves the bowler.
  s2, _, _, _ = bw.bowling_step(state, jnp.asarray(2))  # UP
  assert float(s2.bowler_y) < float(state.bowler_y)


def test_bowling_ten_frames_end_episode():
  from dqn_zoo_tpu.envs.games import bowling as bw
  state = bw.bowling_init(jax.random.PRNGKey(0))
  state = state._replace(frame_no=jnp.asarray(9, jnp.int32),
                         roll_no=jnp.asarray(1, jnp.int32),
                         ball_x=jnp.asarray(160.0, jnp.float32))
  s, _, done, _ = bw.bowling_step(state, jnp.asarray(0))
  assert bool(done)  # tenth frame's second roll finished


def test_bowling_strike_bonus():
  from dqn_zoo_tpu.envs.games import bowling as bw
  state = bw.bowling_init(jax.random.PRNGKey(0))
  # Simulate: first roll in progress past the pins with all 10 down.
  state = state._replace(
      pins=jnp.zeros((10,), jnp.bool_),
      pins_this_frame=jnp.asarray(10, jnp.int32),
      roll_no=jnp.asarray(0, jnp.int32),
      ball_x=jnp.asarray(160.0, jnp.float32))
  s, r, _, _ = bw.bowling_step(state, jnp.asarray(0))
  assert float(r) == bw.STRIKE_BONUS
  assert int(s.frame_no) == 1  # strike ends the frame
  assert bool(s.pins.all())  # fresh rack


# --- fishing_derby ---------------------------------------------------------


def test_fishing_bite_and_active_reel_lands_fish():
  from dqn_zoo_tpu.envs.games import fishing_derby as fd
  state = fd.fishing_derby_init(jax.random.PRNGKey(0))
  lane = 2
  # Park fish 2 on the hook.
  state = state._replace(
      fish_x=state.fish_x.at[lane].set(float(state.hook_x)),
      hook_y=jnp.asarray(fd._lane_y(lane), jnp.float32),
      shark_x=jnp.asarray(130.0, jnp.float32))
  s, _, _, _ = fd.fishing_derby_step(state, jnp.asarray(0))
  assert int(s.hooked_lane) == lane
  # Hold UP: the reel rises monotonically and eventually lands the fish.
  total = 0.0
  for _ in range(60):
    s = s._replace(shark_x=jnp.asarray(130.0, jnp.float32))
    s, r, _, _ = fd.fishing_derby_step(s, jnp.asarray(2))  # UP
    total += float(r)
    if int(s.hooked_lane) < 0:
      break
  assert total >= fd.LANE_VALUES[lane] - fd.OPP_VALUE  # landed (minus opp)
  assert int(s.hooked_lane) == -1


def test_fishing_opponent_scores_steadily_and_ends_episode():
  from dqn_zoo_tpu.envs.games import fishing_derby as fd
  state = fd.fishing_derby_init(jax.random.PRNGKey(0))
  state = state._replace(opp_score=jnp.asarray(96.0, jnp.float32),
                         frame=jnp.asarray(fd.OPP_CATCH_EVERY - 1, jnp.int32))
  s, r, done, _ = fd.fishing_derby_step(state, jnp.asarray(0))
  assert float(r) == -fd.OPP_VALUE
  assert bool(done)  # opponent crossed 99


def test_fishing_slack_line_lets_fish_escape():
  from dqn_zoo_tpu.envs.games import fishing_derby as fd
  state = fd.fishing_derby_init(jax.random.PRNGKey(3))
  state = state._replace(hooked_lane=jnp.asarray(4, jnp.int32),
                         hook_y=jnp.asarray(fd._lane_y(4), jnp.float32))
  escaped = False
  s = state
  for _ in range(200):
    s, _, _, _ = fd.fishing_derby_step(s, jnp.asarray(0))  # NOOP: slack
    if int(s.hooked_lane) < 0:
      escaped = True
      break
  assert escaped  # 5%/frame escape without the reel engaged


def test_random_play_near_ale_anchors():
  """bowling anchor 23.1, fishing_derby -91.7 (atari_data.py:42-102)."""
  from dqn_zoo_tpu.run.atari_data import get_human_normalized_score
  for name, band in (("bowling", 0.08), ("fishing_derby", 0.25)):
    B = 16
    env = VectorAtariEnv(get_game(name), batch_size=B)
    state = env.init(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(3)
    total = np.zeros(B)
    ended = np.zeros(B, bool)
    for _ in range(2500):
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

  env = CppVectorEnv("bowling", batch_size=4, seed=11)
  assert env.num_actions == 6
  total = 0.0
  for _ in range(500):
    out = env.step(rng.randint(0, 6, 4).astype(np.int32))
    total += float(np.sum(out.reward_sum))
  env.close()
  assert total > 0  # random rolls clip some pins

  env = CppVectorEnv("fishing_derby", batch_size=4, seed=12)
  assert env.num_actions == 18
  total = 0.0
  for _ in range(800):
    out = env.step(rng.randint(0, 18, 4).astype(np.int32))
    total += float(np.sum(out.reward_sum))
  env.close()
  assert total < 0  # the scripted opponent outpaces random play
