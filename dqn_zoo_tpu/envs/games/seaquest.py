"""Seaquest: 2D submarine, torpedoes, divers, oxygen, 4 lives.

ALE-compatible surface (the reference registers Seaquest via gym,
gym_atari.py:37-61; BASELINE c51/qrdqn configs name it): the full 18-action
set (8-way movement x optional FIRE), 210x160x3 frames, 4 lives with
life-loss signaling (exercises ZeroDiscountOnLifeLoss,
processors.py:274-293), and the classic mechanics that make the game:

- four horizontal enemy lanes (sharks, +20 per torpedo kill);
- divers swimming in the same lanes (touch to collect, max 6);
- an oxygen tank that depletes underwater and refills at the surface;
- surfacing with 0 divers (or running out of oxygen, or a collision)
  costs a life; surfacing with all 6 divers cashes them in for +50 each
  and advances the level (enemies speed up).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

NUM_LANES = 4
LANE_YS = (80.0, 110.0, 140.0, 170.0)
LANE_DIRS = (1.0, -1.0, 1.0, -1.0)  # march direction per lane
SURFACE_Y = 50.0  # player_y <= this means "at the surface"
SKY_BOTTOM = 46
PLAYER_W, PLAYER_H = 16.0, 8.0
PLAYER_SPEED = 2.0
PLAYER_X0, PLAYER_Y0 = 72.0, 46.0  # spawn: surfaced, mid-screen
X_MIN, X_MAX = 8.0, 152.0 - PLAYER_W
Y_MIN, Y_MAX = 46.0, 180.0
ENEMY_W, ENEMY_H = 12.0, 7.0
ENEMY_BASE_SPEED = 1.0
ENEMY_SPEED_PER_LEVEL = 0.3
ENEMY_RESPAWN_FRAMES = 40
DIVER_W, DIVER_H = 8.0, 7.0
DIVER_SPEED = 0.5
DIVER_SPAWN_PROB = 0.008  # per lane per raw frame
MAX_DIVERS = 6
TORPEDO_W, TORPEDO_H, TORPEDO_SPEED = 6.0, 2.0, 4.0
OXYGEN_MAX = 360.0  # raw frames of air (~90 agent-steps)
OXYGEN_REFILL_RATE = 8.0
LIVES = 4  # ALE seaquest starts with 4 lives
INVULN_FRAMES = 30
KILL_POINTS = 20.0
DIVER_CASH_POINTS = 50.0


class SeaquestState(NamedTuple):
  player_x: jax.Array  # f32, left edge
  player_y: jax.Array  # f32, top edge
  facing: jax.Array  # f32 ±1, torpedo direction
  torp_x: jax.Array  # f32
  torp_y: jax.Array  # f32
  torp_dir: jax.Array  # f32 ±1
  torp_live: jax.Array  # bool
  enemy_x: jax.Array  # (NUM_LANES,) f32, left edge
  enemy_live: jax.Array  # (NUM_LANES,) bool
  enemy_respawn: jax.Array  # (NUM_LANES,) i32 frames until respawn
  diver_x: jax.Array  # (NUM_LANES,) f32
  diver_live: jax.Array  # (NUM_LANES,) bool
  divers_held: jax.Array  # i32, 0..6
  oxygen: jax.Array  # f32, 0..OXYGEN_MAX
  was_surfaced: jax.Array  # bool — previous frame at surface
  lives: jax.Array  # i32
  level: jax.Array  # i32 — completed 6-diver cash-ins
  invuln: jax.Array  # i32 — post-hit grace frames
  key: jax.Array


# Per-action movement tables for the full 18-action ALE set: NOOP, FIRE,
# UP, RIGHT, LEFT, DOWN, UPRIGHT, UPLEFT, DOWNRIGHT, DOWNLEFT, then the
# same eight directions with FIRE.
_DX = (0, 0, 0, 1, -1, 0, 1, -1, 1, -1, 0, 1, -1, 0, 1, -1, 1, -1)
_DY = (0, 0, -1, 0, 0, 1, -1, -1, 1, 1, -1, 0, 0, 1, -1, -1, 1, 1)


def seaquest_init(key: jax.Array) -> SeaquestState:
  key, k_e, k_d = jax.random.split(key, 3)
  enemy_x = jax.random.uniform(k_e, (NUM_LANES,), minval=8.0, maxval=140.0)
  return SeaquestState(
      player_x=jnp.asarray(PLAYER_X0, jnp.float32),
      player_y=jnp.asarray(PLAYER_Y0, jnp.float32),
      facing=jnp.asarray(1.0, jnp.float32),
      torp_x=jnp.zeros((), jnp.float32),
      torp_y=jnp.zeros((), jnp.float32),
      torp_dir=jnp.ones((), jnp.float32),
      torp_live=jnp.zeros((), jnp.bool_),
      enemy_x=enemy_x,
      enemy_live=jnp.ones((NUM_LANES,), jnp.bool_),
      enemy_respawn=jnp.zeros((NUM_LANES,), jnp.int32),
      diver_x=jnp.zeros((NUM_LANES,), jnp.float32),
      diver_live=jax.random.uniform(k_d, (NUM_LANES,)) < 0.25,
      divers_held=jnp.zeros((), jnp.int32),
      oxygen=jnp.asarray(OXYGEN_MAX, jnp.float32),
      was_surfaced=jnp.ones((), jnp.bool_),
      lives=jnp.asarray(LIVES, jnp.int32),
      level=jnp.zeros((), jnp.int32),
      invuln=jnp.zeros((), jnp.int32),
      key=key,
  )


def seaquest_step(state: SeaquestState, action: jax.Array):
  dx = jnp.asarray(_DX, jnp.float32)[action] * PLAYER_SPEED
  dy = jnp.asarray(_DY, jnp.float32)[action] * PLAYER_SPEED
  fire = (action == 1) | (action >= 10)
  player_x = jnp.clip(state.player_x + dx, X_MIN, X_MAX)
  player_y = jnp.clip(state.player_y + dy, Y_MIN, Y_MAX)
  facing = jnp.where(dx != 0, jnp.sign(dx), state.facing)
  surfaced = player_y <= SURFACE_Y
  reward = jnp.zeros((), jnp.float32)

  lane_ys = jnp.asarray(LANE_YS, jnp.float32)
  lane_dirs = jnp.asarray(LANE_DIRS, jnp.float32)

  # Enemies march across their lanes, wrapping; dead lanes respawn off the
  # entry wall after a delay. Speed ramps with the level.
  speed = ENEMY_BASE_SPEED + ENEMY_SPEED_PER_LEVEL * state.level.astype(
      jnp.float32)
  enemy_x = state.enemy_x + lane_dirs * speed * state.enemy_live
  wrapped = (enemy_x < -ENEMY_W) | (enemy_x > 160.0)
  enemy_x = jnp.where(wrapped,
                      jnp.where(lane_dirs > 0, -ENEMY_W, 160.0), enemy_x)
  respawn = jnp.maximum(state.enemy_respawn - 1, 0)
  do_respawn = ~state.enemy_live & (respawn == 0)
  enemy_x = jnp.where(do_respawn,
                      jnp.where(lane_dirs > 0, -ENEMY_W, 160.0), enemy_x)
  enemy_live = state.enemy_live | do_respawn

  # Divers drift the opposite way, slower; idle lanes respawn stochastically.
  key, k_spawn, k_side = jax.random.split(state.key, 3)
  diver_x = state.diver_x - lane_dirs * DIVER_SPEED * state.diver_live
  diver_off = (diver_x < -DIVER_W) | (diver_x > 160.0)
  diver_live = state.diver_live & ~diver_off
  do_diver = (~diver_live
              & (jax.random.uniform(k_spawn, (NUM_LANES,))
                 < DIVER_SPAWN_PROB))
  diver_x = jnp.where(do_diver,
                      jnp.where(lane_dirs > 0, 160.0, -DIVER_W), diver_x)
  diver_live = diver_live | do_diver

  # Torpedo: one on screen; travels horizontally at launch height.
  do_fire = fire & ~state.torp_live & ~surfaced
  torp_x = jnp.where(do_fire,
                     player_x + jnp.where(facing > 0, PLAYER_W, -TORPEDO_W),
                     state.torp_x)
  torp_y = jnp.where(do_fire, player_y + PLAYER_H / 2, state.torp_y)
  torp_dir = jnp.where(do_fire, facing, state.torp_dir)
  torp_live = state.torp_live | do_fire
  torp_x = torp_x + jnp.where(torp_live, torp_dir * TORPEDO_SPEED, 0.0)
  torp_live = torp_live & (torp_x > -TORPEDO_W) & (torp_x < 160.0)

  # Torpedo <-> enemy: same lane band + horizontal overlap.
  same_lane = (torp_y + TORPEDO_H >= lane_ys) & (torp_y
                                                 <= lane_ys + ENEMY_H)
  overlap_x = (torp_x + TORPEDO_W >= enemy_x) & (torp_x
                                                 <= enemy_x + ENEMY_W)
  hit = enemy_live & same_lane & overlap_x & torp_live
  any_hit = hit.any()
  enemy_live = enemy_live & ~hit
  respawn = jnp.where(hit, ENEMY_RESPAWN_FRAMES, respawn)
  torp_live = torp_live & ~any_hit
  reward = reward + KILL_POINTS * hit.sum().astype(jnp.float32)

  # Player <-> diver pickup (up to 6 held).
  p_band = (player_y + PLAYER_H >= lane_ys) & (player_y
                                               <= lane_ys + DIVER_H)
  p_over = (player_x + PLAYER_W >= diver_x) & (player_x
                                               <= diver_x + DIVER_W)
  grab = diver_live & p_band & p_over & (state.divers_held < MAX_DIVERS)
  diver_live = diver_live & ~grab
  divers_held = jnp.minimum(state.divers_held
                            + grab.sum().astype(jnp.int32), MAX_DIVERS)

  # Player <-> enemy collision.
  e_band = (player_y + PLAYER_H >= lane_ys) & (player_y
                                               <= lane_ys + ENEMY_H)
  e_over = (player_x + PLAYER_W >= enemy_x) & (player_x
                                               <= enemy_x + ENEMY_W)
  vulnerable = state.invuln <= 0
  collided = (enemy_live & e_band & e_over).any() & vulnerable & ~surfaced

  # Oxygen: depletes underwater, refills at the surface.
  oxygen = jnp.where(
      surfaced,
      jnp.minimum(state.oxygen + OXYGEN_REFILL_RATE, OXYGEN_MAX),
      state.oxygen - 1.0)
  suffocated = oxygen <= 0.0

  # Surfacing transition (underwater -> surface): with all 6 divers, cash
  # them in (+50 each) and advance the level; with 1..5, one diver
  # disembarks; with none, the trip costs a life (the ALE rule).
  just_surfaced = surfaced & ~state.was_surfaced
  cash_in = just_surfaced & (divers_held == MAX_DIVERS)
  drop_one = just_surfaced & (divers_held > 0) & ~cash_in
  bad_surface = just_surfaced & (divers_held == 0) & vulnerable
  reward = reward + jnp.where(
      cash_in, DIVER_CASH_POINTS * MAX_DIVERS, 0.0)
  divers_held = jnp.where(cash_in, 0,
                          jnp.where(drop_one, divers_held - 1, divers_held))
  level = state.level + cash_in.astype(jnp.int32)

  life_lost_now = collided | suffocated | bad_surface
  lives = state.lives - life_lost_now.astype(jnp.int32)
  done = lives <= 0

  # Respawn after a hit: back to the surface spawn point with full air and
  # a short grace period.
  player_x = jnp.where(life_lost_now, PLAYER_X0, player_x)
  player_y = jnp.where(life_lost_now, PLAYER_Y0, player_y)
  oxygen = jnp.where(life_lost_now, OXYGEN_MAX, oxygen)
  surfaced_next = jnp.where(life_lost_now, True, surfaced)
  invuln = jnp.where(life_lost_now, INVULN_FRAMES,
                     jnp.maximum(state.invuln - 1, 0))
  torp_live = torp_live & ~life_lost_now

  new_state = SeaquestState(
      player_x, player_y, facing, torp_x, torp_y, torp_dir, torp_live,
      enemy_x, enemy_live, respawn, diver_x, diver_live, divers_held,
      oxygen, surfaced_next, lives, level, invuln, key)
  life_lost = life_lost_now & ~done
  return new_state, reward, done, life_lost


def seaquest_render(state: SeaquestState) -> jax.Array:
  water = render.rect_mask(SKY_BOTTOM, 193, 0, 160)
  floor = render.rect_mask(193, 210, 0, 160)
  oxy_w = 60.0 * state.oxygen / OXYGEN_MAX
  oxy = render.rect_mask(198, 203, 49, 49.0 + oxy_w)

  lane_masks = jnp.zeros((210, 160), jnp.bool_)
  diver_masks = jnp.zeros((210, 160), jnp.bool_)
  for i, ly in enumerate(LANE_YS):
    e = render.rect_mask(ly, ly + ENEMY_H, state.enemy_x[i],
                         state.enemy_x[i] + ENEMY_W)
    lane_masks = lane_masks | (
        e & jnp.broadcast_to(state.enemy_live[i], (210, 160)))
    d = render.rect_mask(ly, ly + DIVER_H, state.diver_x[i],
                         state.diver_x[i] + DIVER_W)
    diver_masks = diver_masks | (
        d & jnp.broadcast_to(state.diver_live[i], (210, 160)))

  player = render.rect_mask(state.player_y, state.player_y + PLAYER_H,
                            state.player_x, state.player_x + PLAYER_W)
  torp = render.rect_mask(state.torp_y, state.torp_y + TORPEDO_H,
                          state.torp_x, state.torp_x + TORPEDO_W)
  torp = torp & jnp.broadcast_to(state.torp_live, (210, 160))
  # Held-diver tally marks along the bottom.
  held = jnp.zeros((210, 160), jnp.bool_)
  for i in range(MAX_DIVERS):
    m = render.rect_mask(198, 203, 120 + 6 * i, 124 + 6 * i)
    held = held | (m & jnp.broadcast_to(state.divers_held > i, (210, 160)))

  return render.compose(
      (45, 50, 184),  # sky
      (water, (24, 26, 167)),
      (floor, (158, 208, 101)),
      (oxy, (214, 214, 214)),
      (lane_masks, (92, 186, 92)),  # sharks
      (diver_masks, (66, 72, 200)),
      (held, (24, 59, 157)),
      (torp, (236, 236, 236)),
      (player, (187, 187, 53)),
  )


GAME = register_game(Game(
    name="seaquest",
    num_actions=18,
    init=seaquest_init,
    step=seaquest_step,
    render=seaquest_render,
    lives=lambda state: state.lives,
))
