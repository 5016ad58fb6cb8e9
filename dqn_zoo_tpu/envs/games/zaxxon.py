"""Zaxxon: fly a fighter through a scrolling fortress, shooting targets.

ALE-compatible surface: 18 actions (the full joystick set — the cartridge's
minimal set IS the full 18, gym_atari.py:37-61 registers
`ZaxxonNoFrameskip-v4`), 210×160×3 frames, +50 per drone and +100 per gun
turret destroyed, 3 lives. Fortress walls with a gap sweep toward the ship;
hitting a wall, an enemy, or enemy flak costs a life. Random play dies at
the first walls with a stray kill or two (ALE random anchor 32.5) and the
human anchor is 9173.3 (atari_data.py:42-102): sustained scoring requires
threading every wall gap while strafing targets.

Dynamics are fixed-shape: K enemy slots and one wall scroll leftward at
constant speed; one player shot slot travels right; all interactions are
axis-aligned box overlaps — fully vectorizable under vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

SHIP_X = 28.0
SHIP_W, SHIP_H = 14, 8
Y_MIN, Y_MAX = 44.0, 180.0
SHIP_SPEED = 2.5
SCROLL = 2.0  # world scroll speed (enemies/walls move left)
SHOT_SPEED = 6.0
NUM_ENEMIES = 4
ENEMY_W, ENEMY_H = 10, 8
TURRET_Y = 172.0  # ground turret altitude
DRONE_POINTS = 50.0
TURRET_POINTS = 100.0
WALL_EVERY = 360.0  # world-x distance between walls
WALL_W = 6
GAP_H = 36.0
SPAWN_X = 220.0
LIVES = 3
EPISODE_FRAMES = 15000
DEATH_FREEZE = 40

# Joystick decode for the full 18-action set (ALE order): NOOP, FIRE, UP,
# RIGHT, LEFT, DOWN, UPRIGHT, UPLEFT, DOWNRIGHT, DOWNLEFT, UPFIRE,
# RIGHTFIRE, LEFTFIRE, DOWNFIRE, UPRIGHTFIRE, UPLEFTFIRE, DOWNRIGHTFIRE,
# DOWNLEFTFIRE.
_UP = (2, 6, 7, 10, 14, 15)
_DOWN = (5, 8, 9, 13, 16, 17)
_FIRE = (1, 10, 11, 12, 13, 14, 15, 16, 17)


class ZaxxonState(NamedTuple):
  ship_y: jax.Array  # f32
  shot_x: jax.Array  # f32 (<0 = inactive)
  shot_y: jax.Array
  enemy_x: jax.Array  # (K,) f32
  enemy_y: jax.Array  # (K,) f32
  enemy_turret: jax.Array  # (K,) bool
  enemy_alive: jax.Array  # (K,) bool
  wall_x: jax.Array  # f32, next wall's screen x
  gap_y: jax.Array  # f32, wall gap center
  lives: jax.Array  # i32
  freeze: jax.Array  # i32
  frame: jax.Array  # i32
  key: jax.Array


def _spawn_enemy(key, x_base):
  kx, ky, kt = jax.random.split(key, 3)
  turret = jax.random.bernoulli(kt, 0.4)
  x = x_base + jax.random.uniform(kx, (), maxval=140.0)
  y = jnp.where(turret, TURRET_Y,
                jax.random.uniform(ky, (), minval=Y_MIN, maxval=Y_MAX - 30))
  return x, y, turret


def zaxxon_init(key: jax.Array) -> ZaxxonState:
  key, kw, *keys = jax.random.split(key, 2 + NUM_ENEMIES)
  xs, ys, ts = [], [], []
  for i, k in enumerate(keys):
    x, y, t = _spawn_enemy(k, 120.0 + 90.0 * i)
    xs.append(x)
    ys.append(y)
    ts.append(t)
  return ZaxxonState(
      ship_y=jnp.asarray(110.0, jnp.float32),
      shot_x=jnp.asarray(-1.0, jnp.float32),
      shot_y=jnp.asarray(0.0, jnp.float32),
      enemy_x=jnp.stack(xs), enemy_y=jnp.stack(ys),
      enemy_turret=jnp.stack(ts),
      enemy_alive=jnp.ones((NUM_ENEMIES,), jnp.bool_),
      wall_x=jnp.asarray(300.0, jnp.float32),
      gap_y=jax.random.uniform(kw, (), minval=Y_MIN + GAP_H / 2,
                               maxval=Y_MAX - GAP_H / 2),
      lives=jnp.asarray(LIVES, jnp.int32),
      freeze=jnp.zeros((), jnp.int32),
      frame=jnp.zeros((), jnp.int32),
      key=key,
  )


def zaxxon_step(state: ZaxxonState, action: jax.Array):
  key, k_re, k_gap = jax.random.split(state.key, 3)
  frame = state.frame + 1
  frozen = state.freeze > 0
  freeze = jnp.maximum(state.freeze - 1, 0)

  up = jnp.isin(action, jnp.asarray(_UP))
  down = jnp.isin(action, jnp.asarray(_DOWN))
  fire = jnp.isin(action, jnp.asarray(_FIRE))
  dy = jnp.where(up, -SHIP_SPEED, jnp.where(down, SHIP_SPEED, 0.0))
  ship_y = jnp.clip(state.ship_y + jnp.where(frozen, 0.0, dy), Y_MIN, Y_MAX)

  # Player shot: one slot, fire when empty.
  shot_live = state.shot_x >= 0
  do_fire = fire & ~shot_live & ~frozen
  shot_x = jnp.where(do_fire, SHIP_X + SHIP_W,
                     jnp.where(shot_live, state.shot_x + SHOT_SPEED, -1.0))
  shot_y = jnp.where(do_fire, ship_y + SHIP_H / 2, state.shot_y)
  # Limited shot range (the cartridge's shots detonate mid-field): halves a
  # spray-and-pray policy's exposure, keeping random play near the 32.5
  # ALE anchor.
  shot_x = jnp.where(shot_x > 140.0, -1.0, shot_x)

  # Scroll enemies/wall.
  scroll = jnp.where(frozen, 0.0, SCROLL)
  ex = state.enemy_x - scroll
  wall_x = state.wall_x - scroll

  # Shot hits: box overlap with any live enemy.
  hit = ((state.shot_x >= 0)
         & (shot_x + 2 >= ex) & (shot_x <= ex + ENEMY_W)
         & (shot_y + 2 >= state.enemy_y) & (shot_y <= state.enemy_y + ENEMY_H)
         & state.enemy_alive)
  any_hit = hit.any()
  first_hit = jnp.argmax(hit)  # one shot kills at most one target
  killed = jnp.zeros((NUM_ENEMIES,), jnp.bool_).at[first_hit].set(any_hit)
  reward = jnp.where(
      any_hit,
      jnp.where(state.enemy_turret[first_hit], TURRET_POINTS, DRONE_POINTS),
      0.0)
  alive = state.enemy_alive & ~killed
  shot_x = jnp.where(any_hit, -1.0, shot_x)

  # Recycle dead / off-screen enemies ahead of the ship.
  keys = jax.random.split(k_re, NUM_ENEMIES)
  sx, sy, st = jax.vmap(_spawn_enemy, in_axes=(0, None))(keys, SPAWN_X)
  recycle = (~alive) | (ex < -ENEMY_W)
  ex = jnp.where(recycle, sx, ex)
  ey = jnp.where(recycle, sy, state.enemy_y)
  et = jnp.where(recycle, st, state.enemy_turret)
  alive = alive | recycle

  # Wall passes / recycles.
  wall_gone = wall_x < -WALL_W
  gap_y = jnp.where(
      wall_gone,
      jax.random.uniform(k_gap, (), minval=Y_MIN + GAP_H / 2,
                         maxval=Y_MAX - GAP_H / 2),
      state.gap_y)
  wall_x = jnp.where(wall_gone, wall_x + WALL_EVERY, wall_x)

  # Collisions: wall (outside the gap) or enemy body.
  ship_box_x1 = SHIP_X + SHIP_W
  wall_overlap = (wall_x <= ship_box_x1) & (wall_x + WALL_W >= SHIP_X)
  in_gap = (ship_y >= gap_y - GAP_H / 2) & \
      (ship_y + SHIP_H <= gap_y + GAP_H / 2)
  wall_crash = wall_overlap & ~in_gap & ~frozen
  enemy_crash = ((ex <= ship_box_x1) & (ex + ENEMY_W >= SHIP_X)
                 & (ey <= ship_y + SHIP_H) & (ey + ENEMY_H >= ship_y)
                 & alive).any() & ~frozen
  died = wall_crash | enemy_crash
  lives = state.lives - died.astype(jnp.int32)
  done = (lives <= 0) | (frame >= EPISODE_FRAMES)
  # Death reset: recenter, clear the oncoming wall and nearby enemies.
  ship_y = jnp.where(died, 110.0, ship_y)
  wall_x = jnp.where(died, wall_x + WALL_EVERY, wall_x)
  ex = jnp.where(died & (ex < 120.0), ex + 200.0, ex)
  freeze = jnp.where(died, DEATH_FREEZE, freeze)
  shot_x = jnp.where(died, -1.0, shot_x)

  new_state = ZaxxonState(ship_y, shot_x, shot_y, ex, ey, et, alive,
                          wall_x, gap_y, lives, freeze, frame, key)
  life_lost = died & ~done
  return new_state, reward, done, life_lost


def zaxxon_render(state: ZaxxonState) -> jax.Array:
  bg = (18, 24, 48)
  ground = render.rect_mask(182, 210, 0, 160)
  wall_top = render.rect_mask(int(Y_MIN) - 8, state.gap_y - GAP_H / 2,
                              state.wall_x, state.wall_x + WALL_W)
  wall_bot = render.rect_mask(state.gap_y + GAP_H / 2, 182,
                              state.wall_x, state.wall_x + WALL_W)
  ship = render.rect_mask(state.ship_y, state.ship_y + SHIP_H, SHIP_X,
                          SHIP_X + SHIP_W)
  shot = render.rect_mask(state.shot_y, state.shot_y + 2, state.shot_x,
                          state.shot_x + 4) & (state.shot_x >= 0)
  enemies = jnp.zeros((210, 160), jnp.bool_)
  turrets = jnp.zeros((210, 160), jnp.bool_)
  for i in range(NUM_ENEMIES):
    m = render.rect_mask(state.enemy_y[i], state.enemy_y[i] + ENEMY_H,
                         state.enemy_x[i], state.enemy_x[i] + ENEMY_W) & \
        state.enemy_alive[i]
    enemies = enemies | (m & ~state.enemy_turret[i])
    turrets = turrets | (m & state.enemy_turret[i])
  lives_bar = render.rect_mask(200, 206, 8, 8 + 10 * state.lives)
  return render.compose(
      bg,
      (ground, (60, 70, 60)),
      (wall_top, (140, 140, 160)),
      (wall_bot, (140, 140, 160)),
      (turrets, (188, 96, 60)),
      (enemies, (90, 180, 90)),
      (shot, (240, 240, 120)),
      (ship, (220, 220, 230)),
      (lives_bar, (220, 220, 230)),
  )


GAME = register_game(Game(
    name="zaxxon",
    num_actions=18,
    init=zaxxon_init,
    step=zaxxon_step,
    render=zaxxon_render,
    lives=lambda state: state.lives,
))
