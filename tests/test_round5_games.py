"""Behavior tests for the round-5 games: demon_attack, phoenix, assault,
ice_hockey, crazy_climber (same strategy as tests/test_new_games.py:
mechanics probed at the single-game function level plus vectorized
protocol smoke, mirroring gym_atari_test.py's per-game checks). Scoring
scale is pinned against the reference's random anchors
(run/atari_data.py) — the breakout round-3 lesson: a random agent must
read ≈0 normalized."""

import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu.envs import VectorAtariEnv, get_game
from dqn_zoo_tpu.run import atari_data

NEW_GAMES = ("demon_attack", "phoenix", "assault", "ice_hockey",
             "crazy_climber")


def test_round5_games_render_and_step():
  for name in NEW_GAMES:
    env = VectorAtariEnv(get_game(name), batch_size=4)
    state = env.init(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(1)
    frames = []
    for _ in range(12):
      key, k = jax.random.split(key)
      actions = jax.random.randint(k, (4,), 0, env.num_actions)
      state, out = step(state, actions)
      frames.append(np.asarray(out.frame_last))
    frames = np.stack(frames)
    assert frames.shape[1:] == (4, 210, 160, 3)
    assert frames.sum() > 0
    assert not np.array_equal(frames[0], frames[-1]), name


def test_action_set_sizes_match_ale():
  # Minimal action set sizes of the cartridges (ref gym_atari.py:26-61 via
  # atari-py): demon_attack 6, phoenix 8, assault 7, ice_hockey 18,
  # crazy_climber 9.
  sizes = {"demon_attack": 6, "phoenix": 8, "assault": 7,
           "ice_hockey": 18, "crazy_climber": 9}
  for name, n in sizes.items():
    assert get_game(name).num_actions == n, name


# --- demon_attack ----------------------------------------------------------


def test_demon_attack_kill_pays_wave_scaled_bounty():
  from dqn_zoo_tpu.envs.games import demon_attack as da
  state = da.demon_attack_init(jax.random.PRNGKey(0))
  # Put a live shot just below the lowest demon band, demon right there.
  state = state._replace(
      demon_x=state.demon_x.at[2].set(80.0),
      shot_x=jnp.asarray(82.0, jnp.float32),
      shot_y=jnp.asarray(da.DEMON_YS[2] + 4.0, jnp.float32),
      shot_live=jnp.asarray(True),
      wave=jnp.asarray(2, jnp.int32))
  s2, reward, done, life_lost = da.demon_attack_step(state, jnp.asarray(0))
  assert float(reward) == da.BASE_POINTS * 3  # (wave+1) * base
  assert not bool(s2.demon_live[2])
  assert int(s2.demon_delay[2]) == da.RESPAWN_FRAMES
  assert not bool(s2.shot_live)


def test_demon_attack_bomb_costs_life_and_zero_points():
  from dqn_zoo_tpu.envs.games import demon_attack as da
  state = da.demon_attack_init(jax.random.PRNGKey(0))
  state = state._replace(
      player_x=jnp.asarray(80.0, jnp.float32),
      bomb_x=state.bomb_x.at[0].set(84.0),
      bomb_y=state.bomb_y.at[0].set(float(da.PLAYER_Y) - 2.0),
      bomb_live=state.bomb_live.at[0].set(True))
  s2, reward, done, life_lost = da.demon_attack_step(state, jnp.asarray(0))
  assert float(reward) == 0.0
  assert int(s2.lives) == da.LIVES - 1
  assert bool(life_lost) and not bool(done)
  assert int(s2.hit_pause) == da.HIT_PAUSE


# --- phoenix ---------------------------------------------------------------


def test_phoenix_shield_blocks_dive_and_pays_bonus():
  from dqn_zoo_tpu.envs.games import phoenix as ph
  state = ph.phoenix_init(jax.random.PRNGKey(0))
  # A diving bird overlapping the ship, shield up.
  state = state._replace(
      player_x=jnp.asarray(80.0, jnp.float32),
      bird_x=state.bird_x.at[0].set(80.0),
      bird_y=state.bird_y.at[0].set(float(ph.PLAYER_Y) - 2.0),
      bird_diving=state.bird_diving.at[0].set(True),
      shield=jnp.asarray(10, jnp.int32))
  s2, reward, done, life_lost = ph.phoenix_step(state, jnp.asarray(0))
  assert float(reward) == ph.DIVER_BONUS
  assert int(s2.lives) == ph.LIVES
  assert not bool(life_lost)
  assert not bool(s2.bird_live[0])

  # Same dive without the shield: life lost, no points.
  state = state._replace(shield=jnp.asarray(0, jnp.int32))
  s3, reward, done, life_lost = ph.phoenix_step(state, jnp.asarray(0))
  assert float(reward) == 0.0
  assert int(s3.lives) == ph.LIVES - 1
  assert bool(life_lost)


def test_phoenix_rank_points():
  from dqn_zoo_tpu.envs.games import phoenix as ph
  for idx, pts in ((0, ph.POINTS[0]), (5, ph.POINTS[1])):
    state = ph.phoenix_init(jax.random.PRNGKey(1))
    # Park every bird far away, then place the target on the shot.
    state = state._replace(
        bird_x=jnp.full_like(state.bird_x, -50.0),
        bird_diving=jnp.zeros_like(state.bird_diving),
        shot_x=jnp.asarray(80.0, jnp.float32),
        shot_y=jnp.asarray(float(ph._RANK_Y[idx]) + 2.0, jnp.float32),
        shot_live=jnp.asarray(True))
    state = state._replace(bird_x=state.bird_x.at[idx].set(78.0))
    s2, reward, _, _ = ph.phoenix_step(state, jnp.asarray(0))
    assert float(reward) == pts, (idx, float(reward))
    assert not bool(s2.bird_live[idx])


# --- assault ---------------------------------------------------------------


def test_assault_overheat_costs_life():
  from dqn_zoo_tpu.envs.games import assault as asl
  state = asl.assault_init(jax.random.PRNGKey(0))
  state = state._replace(heat=jnp.asarray(asl.HEAT_MAX + 5, jnp.int32))
  s2, reward, done, life_lost = asl.assault_step(state, jnp.asarray(0))
  assert int(s2.lives) == asl.LIVES - 1
  assert bool(life_lost) and not bool(done)
  assert int(s2.heat) == 0  # meter resets after the blowup


def test_assault_heat_only_on_real_shots():
  from dqn_zoo_tpu.envs.games import assault as asl
  state = asl.assault_init(jax.random.PRNGKey(0))
  # First FIRE spawns a shot and adds heat.
  s1, _, _, _ = asl.assault_step(state, jnp.asarray(1))
  assert bool(s1.shot_live)
  assert int(s1.heat) == asl.HEAT_PER_SHOT
  # FIRE while the shot is still in flight: no new shot, no extra heat
  # (it cools by 1 instead).
  s2, _, _, _ = asl.assault_step(s1, jnp.asarray(1))
  assert int(s2.heat) == asl.HEAT_PER_SHOT - asl.COOL_PER_FRAME


def test_assault_drone_kill_scores_cartridge_increment():
  from dqn_zoo_tpu.envs.games import assault as asl
  state = asl.assault_init(jax.random.PRNGKey(0))
  state = state._replace(
      drone_x=state.drone_x.at[0].set(80.0),
      drone_y=state.drone_y.at[0].set(120.0),
      drone_live=state.drone_live.at[0].set(True),
      shot_x=jnp.asarray(84.0, jnp.float32),
      shot_y=jnp.asarray(123.0, jnp.float32),
      shot_live=jnp.asarray(True))
  s2, reward, _, _ = asl.assault_step(state, jnp.asarray(0))
  assert float(reward) == asl.DRONE_POINTS
  assert not bool(s2.drone_live[0])


# --- ice_hockey ------------------------------------------------------------


def test_ice_hockey_signed_goals_and_faceoff():
  from dqn_zoo_tpu.envs.games import ice_hockey as ih
  state = ih.ice_hockey_init(jax.random.PRNGKey(0))
  # Loose puck flying into the top goal mouth.
  state = state._replace(
      puck_x=jnp.asarray(78.0, jnp.float32),
      puck_y=jnp.asarray(ih.TOP + 1.0, jnp.float32),
      puck_vx=jnp.asarray(0.0, jnp.float32),
      puck_vy=jnp.asarray(-ih.SHOT_SPEED, jnp.float32),
      carrier=jnp.asarray(0, jnp.int32),
      px=jnp.asarray(20.0, jnp.float32), py=jnp.asarray(180.0, jnp.float32),
      ex=jnp.asarray(130.0, jnp.float32), ey=jnp.asarray(45.0, jnp.float32))
  s2, reward, done, _ = ih.ice_hockey_step(state, jnp.asarray(0))
  assert float(reward) == 1.0
  assert int(s2.faceoff_delay) > 0  # center faceoff pause
  assert float(s2.puck_x) == 78.0  # puck re-centered

  # Bottom goal: enemy scores, signed -1.
  state = state._replace(
      puck_y=jnp.asarray(ih.BOTTOM - ih.PUCK - 1.0, jnp.float32),
      puck_vy=jnp.asarray(ih.SHOT_SPEED, jnp.float32))
  s3, reward, _, _ = ih.ice_hockey_step(state, jnp.asarray(0))
  assert float(reward) == -1.0


def test_ice_hockey_clock_ends_episode_no_lives():
  from dqn_zoo_tpu.envs.games import ice_hockey as ih
  g = get_game("ice_hockey")
  state = ih.ice_hockey_init(jax.random.PRNGKey(0))
  state = state._replace(frame=jnp.asarray(ih.CLOCK_FRAMES - 1, jnp.int32))
  s2, _, done, life_lost = ih.ice_hockey_step(state, jnp.asarray(0))
  assert bool(done) and not bool(life_lost)
  assert int(g.lives(s2)) == 1  # no lives signal, like tennis


# --- crazy_climber ---------------------------------------------------------


def test_crazy_climber_mechanics():
  from dqn_zoo_tpu.envs.games import crazy_climber as cc
  state = cc.crazy_climber_init(jax.random.PRNGKey(0))
  # Find a frame phase where the window above is open, then climb.
  state = state._replace(frame=jnp.asarray(0, jnp.int32),
                         shut_phase=jnp.zeros_like(state.shut_phase),
                         col=jnp.asarray(3, jnp.int32),
                         row=jnp.asarray(0, jnp.int32))
  closed = bool(cc._shutter_closed(state, state.col, state.row + 1))
  assert not closed  # phase 0+37 < 120 → open
  s2, reward, _, _ = cc.crazy_climber_step(state, jnp.asarray(1))  # UP
  assert int(s2.row) == 1
  assert float(reward) == cc.ROW_POINTS
  # A closed shutter blocks UP: pick a frame that closes the window above.
  per = cc.SHUT_PERIOD
  blocked_frame = (per * 2) // 3  # phase = frame + 0 + row*37
  state = state._replace(frame=jnp.asarray(blocked_frame - 2 * 37,
                                           jnp.int32),
                         row=jnp.asarray(1, jnp.int32), move_cd=jnp.asarray(
                             0, jnp.int32))
  if bool(cc._shutter_closed(state, state.col, state.row + 1)):
    s3, reward, _, _ = cc.crazy_climber_step(state, jnp.asarray(1))
    assert int(s3.row) == 1  # blocked
    assert float(reward) == 0.0


def test_crazy_climber_pot_knockdown():
  from dqn_zoo_tpu.envs.games import crazy_climber as cc
  state = cc.crazy_climber_init(jax.random.PRNGKey(0))
  state = state._replace(
      col=jnp.asarray(2, jnp.int32), row=jnp.asarray(5, jnp.int32),
      pot_col=state.pot_col.at[0].set(2),
      pot_y=state.pot_y.at[0].set(148.0),
      pot_live=state.pot_live.at[0].set(True))
  s2, _, done, life_lost = cc.crazy_climber_step(state, jnp.asarray(0))
  assert int(s2.lives) == cc.LIVES - 1
  assert bool(life_lost) and not bool(done)
  assert int(s2.row) == 3  # falls two rows


def test_crazy_climber_top_bonus_and_next_building():
  from dqn_zoo_tpu.envs.games import crazy_climber as cc
  state = cc.crazy_climber_init(jax.random.PRNGKey(0))
  state = state._replace(row=jnp.asarray(cc.ROWS, jnp.int32))
  s2, reward, _, _ = cc.crazy_climber_step(state, jnp.asarray(0))
  assert float(reward) >= cc.TOP_BONUS
  assert int(s2.building) == 1
  assert int(s2.row) == 0


# --- scoring scale vs the reference anchors --------------------------------


def test_random_play_score_scale_vs_anchors():
  """Random-agent per-episode scores must sit near the ALE random anchors
  (atari_data.py) so iteration-0 normalized reads ~0 — the round-3
  breakout miscalibration lesson. Bounds are loose (seeded run, few
  episodes) but catch order-of-magnitude drift."""
  targets = {  # name -> (lo, hi) acceptable random/episode band
      "demon_attack": (40, 500),
      "phoenix": (400, 3500),
      "assault": (20, 550),
      "ice_hockey": (-30, 0),
      "crazy_climber": (3000, 25000),
  }
  for name, (lo, hi) in targets.items():
    g = get_game(name)
    step = jax.jit(g.step)
    rng = np.random.RandomState(7)
    eps, cur, frames = [], 0.0, 0
    s = g.init(jax.random.PRNGKey(42))
    t = 0
    while len(eps) < 3 and t < 50000:
      t += 1
      s, r, d, _ = step(s, jnp.asarray(rng.randint(g.num_actions)))
      cur += float(r)
      frames += 1
      if bool(d) or frames >= 15000:
        eps.append(cur)
        cur, frames = 0.0, 0
        s = g.init(jax.random.PRNGKey(t))
    mean = float(np.mean(eps))
    anchor = atari_data.get_human_normalized_score(name, mean)
    assert lo <= mean <= hi, (name, mean, eps)
    # Normalized |score| of random play stays well under 0.5.
    assert abs(anchor) < 0.5, (name, mean, anchor)


# --- beam_rider / star_gunner (round-5b) ------------------------------------


def test_beam_rider_lane_shot_and_torpedo():
  from dqn_zoo_tpu.envs.games import beam_rider as br
  state = br.beam_rider_init(jax.random.PRNGKey(0))
  # Saucer on the ship's beam in the laser's path.
  state = state._replace(
      ship_beam=jnp.asarray(2, jnp.int32),
      saucer_beam=state.saucer_beam.at[0].set(2),
      saucer_y=state.saucer_y.at[0].set(100.0),
      saucer_live=state.saucer_live.at[0].set(True),
      shot_beam=jnp.asarray(2, jnp.int32),
      shot_y=jnp.asarray(104.0, jnp.float32),
      shot_live=jnp.asarray(True))
  s2, reward, _, _ = br.beam_rider_step(state, jnp.asarray(0))
  assert float(reward) == br.SAUCER_POINTS
  assert not bool(s2.saucer_live[0])
  # Torpedo (UP) clears the beam and decrements the stock.
  state = br.beam_rider_init(jax.random.PRNGKey(1))
  state = state._replace(
      ship_beam=jnp.asarray(1, jnp.int32),
      saucer_beam=state.saucer_beam.at[:].set(1),
      saucer_y=state.saucer_y.at[:].set(90.0),
      saucer_live=jnp.ones_like(state.saucer_live))
  s3, reward, _, _ = br.beam_rider_step(state, jnp.asarray(2))
  assert float(reward) == br.TORPEDO_POINTS * br.NUM_SAUCERS
  assert int(s3.torpedoes) == br.TORPEDOES_PER_SECTOR - 1
  assert not bool(s3.saucer_live.any())
  # Without stock, UP does nothing.
  s4, reward, _, _ = br.beam_rider_step(
      s3._replace(torpedoes=jnp.asarray(0, jnp.int32)), jnp.asarray(2))
  assert int(s4.torpedoes) == 0


def test_beam_rider_collision_costs_life():
  from dqn_zoo_tpu.envs.games import beam_rider as br
  state = br.beam_rider_init(jax.random.PRNGKey(0))
  state = state._replace(
      ship_beam=jnp.asarray(3, jnp.int32),
      saucer_beam=state.saucer_beam.at[0].set(3),
      saucer_y=state.saucer_y.at[0].set(br.SHIP_Y - 2.0),
      saucer_live=state.saucer_live.at[0].set(True))
  s2, _, done, life_lost = br.beam_rider_step(state, jnp.asarray(0))
  assert int(s2.lives) == br.LIVES - 1
  assert bool(life_lost) and not bool(done)


def test_star_gunner_kill_and_bolt():
  from dqn_zoo_tpu.envs.games import star_gunner as sg
  state = sg.star_gunner_init(jax.random.PRNGKey(0))
  state = state._replace(
      sx=jnp.asarray(30.0, jnp.float32), sy=jnp.asarray(100.0, jnp.float32),
      rx=state.rx.at[0].set(80.0), ry=state.ry.at[0].set(100.0),
      rlive=state.rlive.at[0].set(True),
      shot_x=jnp.asarray(72.0, jnp.float32),
      shot_y=jnp.asarray(104.0, jnp.float32),
      shot_live=jnp.asarray(True))
  s2, reward, _, _ = sg.star_gunner_step(state, jnp.asarray(0))
  assert float(reward) == sg.RAIDER_POINTS
  assert not bool(s2.rlive[0])
  assert int(s2.wave) == 1  # kill counter drives the difficulty ramp
  # Bolt on the ship: life lost.
  state = sg.star_gunner_init(jax.random.PRNGKey(1))
  state = state._replace(
      sx=jnp.asarray(30.0, jnp.float32), sy=jnp.asarray(100.0, jnp.float32),
      bx=state.bx.at[0].set(34.0), by=state.by.at[0].set(102.0),
      blive=state.blive.at[0].set(True))
  s3, _, done, life_lost = sg.star_gunner_step(state, jnp.asarray(0))
  assert int(s3.lives) == sg.LIVES - 1
  assert bool(life_lost) and not bool(done)
