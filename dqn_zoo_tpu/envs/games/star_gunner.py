"""Star Gunner: free-flying gunship vs warping raiders, 5 lives.

ALE-compatible surface (ref gym_atari.py:37-61; full 18-action set like
the cartridge). The ship moves in both axes on the left half of a star
field; raiders warp in on the right edge at random altitudes, sweep left
while jinking, and fire homing bolts. A raider kill pays 100 (the
cartridge's lowest bounty tier, which dominates early play); a bolt or a
raider reaching the ship costs a life (5 lives, life-loss signal).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

TOP, BOTTOM = 40.0, 196.0
LEFT, RIGHT = 8.0, 152.0
SHIP_W, SHIP_H = 12, 8
SHIP_SPEED = 2.6
NUM_RAIDERS = 3
RAIDER_W, RAIDER_H = 10, 7
RAIDER_SPEED = 1.3
SPAWN_DELAY = 70
SHOT_W, SHOT_SPEED = 6, 7.0  # horizontal laser
BOLT, BOLT_SPEED = 3, 2.4
BOLT_PROB = 0.02
LIVES = 5
HIT_PAUSE = 35
RAIDER_POINTS = 100.0


class StarGunnerState(NamedTuple):
  sx: jax.Array  # ship left edge, f32
  sy: jax.Array
  rx: jax.Array  # (N,) raiders
  ry: jax.Array
  rvy: jax.Array  # (N,) vertical jink velocity
  rlive: jax.Array  # (N,) bool
  rdelay: jax.Array  # (N,) i32 respawn countdown
  shot_x: jax.Array  # f32 (travels right)
  shot_y: jax.Array
  shot_live: jax.Array
  bx: jax.Array  # (N,) bolts
  by: jax.Array
  blive: jax.Array
  lives: jax.Array
  wave: jax.Array
  hit_pause: jax.Array
  key: jax.Array


def _decode(action):
  """ALE 18-action decode (same scheme as boxing/ice_hockey)."""
  fire = (action == 1) | (action >= 10)
  a = jnp.where(action >= 10, action - 8, action)
  up = (a == 2) | (a == 6) | (a == 7)
  right = (a == 3) | (a == 6) | (a == 8)
  left = (a == 4) | (a == 7) | (a == 9)
  down = (a == 5) | (a == 8) | (a == 9)
  dx = right.astype(jnp.float32) - left.astype(jnp.float32)
  dy = down.astype(jnp.float32) - up.astype(jnp.float32)
  return dx, dy, fire


def star_gunner_init(key: jax.Array) -> StarGunnerState:
  key, k1, k2 = jax.random.split(key, 3)
  return StarGunnerState(
      sx=jnp.asarray(24.0, jnp.float32),
      sy=jax.random.uniform(k1, (), minval=TOP + 20, maxval=BOTTOM - 30),
      rx=jnp.full((NUM_RAIDERS,), RIGHT, jnp.float32),
      ry=jax.random.uniform(k2, (NUM_RAIDERS,), minval=TOP,
                            maxval=BOTTOM - RAIDER_H),
      rvy=jnp.zeros((NUM_RAIDERS,), jnp.float32),
      rlive=jnp.zeros((NUM_RAIDERS,), jnp.bool_),
      rdelay=jnp.asarray([5, 35, 65], jnp.int32),
      shot_x=jnp.zeros((), jnp.float32),
      shot_y=jnp.zeros((), jnp.float32),
      shot_live=jnp.zeros((), jnp.bool_),
      bx=jnp.zeros((NUM_RAIDERS,), jnp.float32),
      by=jnp.zeros((NUM_RAIDERS,), jnp.float32),
      blive=jnp.zeros((NUM_RAIDERS,), jnp.bool_),
      lives=jnp.asarray(LIVES, jnp.int32),
      wave=jnp.zeros((), jnp.int32),
      hit_pause=jnp.zeros((), jnp.int32),
      key=key,
  )


def star_gunner_step(state: StarGunnerState, action: jax.Array):
  dx, dy, fire = _decode(action)
  sx = jnp.clip(state.sx + dx * SHIP_SPEED, LEFT, 76.0)  # left half only
  sy = jnp.clip(state.sy + dy * SHIP_SPEED, TOP, BOTTOM - SHIP_H)

  key, k_jink, k_spawn_y, k_bolt = jax.random.split(state.key, 4)
  # `wave` counts KILLS; difficulty steps up every 10 of them.
  speed = RAIDER_SPEED + 0.3 * (state.wave // 10).astype(jnp.float32)
  # Raiders sweep left, jinking vertically toward the ship's altitude.
  jink = jnp.clip(sy - state.ry, -1.0, 1.0) \
      + jax.random.uniform(k_jink, (NUM_RAIDERS,), minval=-0.8, maxval=0.8)
  rvy = 0.8 * state.rvy + 0.4 * jink
  rx = state.rx - jnp.where(state.rlive, speed, 0.0)
  ry = jnp.clip(state.ry + jnp.where(state.rlive, rvy, 0.0),
                TOP, BOTTOM - RAIDER_H)
  rdelay = jnp.maximum(state.rdelay - 1, 0)
  respawn = ~state.rlive & (rdelay == 0)
  rx = jnp.where(respawn, RIGHT, rx)
  ry = jnp.where(
      respawn,
      jax.random.uniform(k_spawn_y, (NUM_RAIDERS,), minval=TOP,
                         maxval=BOTTOM - RAIDER_H),
      ry)
  rlive = state.rlive | respawn

  # Laser: travels RIGHT from the ship nose (horizontal shooter).
  do_fire = fire & ~state.shot_live
  shot_x = jnp.where(do_fire, sx + SHIP_W, state.shot_x)
  shot_y = jnp.where(do_fire, sy + SHIP_H / 2, state.shot_y)
  shot_live = state.shot_live | do_fire
  shot_x = shot_x + jnp.where(shot_live, SHOT_SPEED, 0.0)
  shot_live = shot_live & (shot_x < RIGHT + 8.0)

  hit = (shot_live & rlive
         & (shot_x + SHOT_W >= rx) & (shot_x <= rx + RAIDER_W)
         & (shot_y >= ry) & (shot_y <= ry + RAIDER_H))
  any_hit = hit.any()
  near_idx = jnp.argmax(hit)  # one kill per laser
  kill = hit & (jnp.arange(NUM_RAIDERS) == near_idx) & any_hit
  rlive = rlive & ~kill
  rdelay = jnp.where(kill, SPAWN_DELAY, rdelay)
  shot_live = shot_live & ~any_hit
  reward = jnp.where(any_hit, RAIDER_POINTS, 0.0)
  wave = state.wave + jnp.sum(kill).astype(jnp.int32)

  # Bolts: homing-ish, fired toward the ship.
  do_bolt = (rlive & ~state.blive
             & (jax.random.uniform(k_bolt, (NUM_RAIDERS,)) < BOLT_PROB))
  bx = jnp.where(do_bolt, rx, state.bx)
  by = jnp.where(do_bolt, ry + RAIDER_H / 2, state.by)
  blive = state.blive | do_bolt
  steer = jnp.clip(sy + SHIP_H / 2 - by, -1.2, 1.2)
  bx = bx - jnp.where(blive, BOLT_SPEED, 0.0)
  by = by + jnp.where(blive, steer, 0.0)
  blive = blive & (bx > LEFT - 6.0)

  vulnerable = state.hit_pause <= 0
  hit_pause = jnp.maximum(state.hit_pause - 1, 0)
  bolt_hit = (blive & (bx <= sx + SHIP_W) & (bx + BOLT >= sx)
              & (by + BOLT >= sy) & (by <= sy + SHIP_H))
  ram = (rlive & (rx <= sx + SHIP_W) & (rx + RAIDER_W >= sx)
         & (ry + RAIDER_H >= sy) & (ry <= sy + SHIP_H))
  off_left = rlive & (rx < LEFT)  # raider escapes past the ship line
  rlive = rlive & ~off_left & ~ram
  rdelay = jnp.where(off_left | ram, SPAWN_DELAY, rdelay)
  destroyed = (bolt_hit.any() | ram.any()) & vulnerable
  blive = blive & ~destroyed
  lives = state.lives - destroyed.astype(jnp.int32)
  hit_pause = jnp.where(destroyed, HIT_PAUSE, hit_pause)

  done = lives <= 0
  new_state = StarGunnerState(
      sx, sy, rx, ry, rvy, rlive, rdelay, shot_x, shot_y, shot_live,
      bx, by, blive, lives, wave, hit_pause, key)
  life_lost = destroyed & ~done
  return new_state, reward, done, life_lost


def star_gunner_render(state: StarGunnerState) -> jax.Array:
  bg = (4, 4, 20)
  stars = render.rect_mask(TOP - 4, TOP - 2, 0, 160)
  raiders = jnp.zeros((210, 160), jnp.bool_)
  for i in range(NUM_RAIDERS):
    r = render.rect_mask(state.ry[i], state.ry[i] + RAIDER_H,
                         state.rx[i], state.rx[i] + RAIDER_W)
    raiders = raiders | (r & jnp.broadcast_to(state.rlive[i], (210, 160)))
  bolts = jnp.zeros((210, 160), jnp.bool_)
  for i in range(NUM_RAIDERS):
    b = render.rect_mask(state.by[i], state.by[i] + BOLT,
                         state.bx[i], state.bx[i] + BOLT)
    bolts = bolts | (b & jnp.broadcast_to(state.blive[i], (210, 160)))
  shot = render.rect_mask(state.shot_y - 1, state.shot_y + 1,
                          state.shot_x, state.shot_x + SHOT_W)
  ship = render.rect_mask(state.sy, state.sy + SHIP_H,
                          state.sx, state.sx + SHIP_W)
  return render.compose(
      bg,
      (stars, (70, 70, 110)),
      (raiders, (226, 110, 110)),
      (bolts, (250, 200, 80)),
      (shot & jnp.broadcast_to(state.shot_live, (210, 160)),
       (250, 250, 250)),
      (ship, (110, 200, 110)),
  )


GAME = register_game(Game(
    name="star_gunner",
    num_actions=18,
    init=star_gunner_init,
    step=star_gunner_step,
    render=star_gunner_render,
    lives=lambda state: state.lives,
))
