"""Freeway: a chicken crosses ten lanes of traffic against a timer.

ALE-compatible surface: 3 actions (NOOP, UP, DOWN), 210×160×3 frames,
+1 per full crossing, no lives, fixed-length timed episode (2:16 of game
time — the ALE cartridge's clock), collisions knock the chicken back down.
Random play scores ~0 and the human anchor is 29.6 (atari_data.py:42-102),
which this parameterization preserves: reaching the top requires ~80 raw
frames of mostly-UP play through moving traffic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

NUM_LANES = 10
LANE_TOP = 24  # first lane's top edge
LANE_H = 16
ROAD_BOTTOM = LANE_TOP + NUM_LANES * LANE_H  # 184
GOAL_Y = 20.0
START_Y = 186.0
CHICKEN_X = 44.0
CHICKEN_W, CHICKEN_H = 6, 8
CHICKEN_SPEED = 2.0
KNOCKBACK = 24.0
CAR_W, CAR_H = 16, 10
EPISODE_FRAMES = 8160  # 2 min 16 s at 60 Hz, the ALE game clock
# Per-lane speeds (px/frame); bottom five lanes drive right, top five left.
LANE_SPEEDS = (1.2, 2.0, 1.5, 2.5, 1.8, 1.8, 2.5, 1.5, 2.0, 1.2)
CAR_COLORS = ((167, 26, 26), (184, 50, 50), (200, 72, 72), (198, 108, 58),
              (180, 122, 48), (162, 134, 56), (134, 134, 29), (84, 138, 210),
              (66, 114, 194), (45, 87, 176))


class FreewayState(NamedTuple):
  chicken_y: jax.Array  # f32
  car_x: jax.Array  # (NUM_LANES,) f32, left edge (wraps mod 160)
  frame: jax.Array  # i32 — raw frames elapsed this episode
  key: jax.Array


def _lane_tops():
  return jnp.asarray(
      [LANE_TOP + i * LANE_H + (LANE_H - CAR_H) // 2
       for i in range(NUM_LANES)], jnp.float32)


def freeway_init(key: jax.Array) -> FreewayState:
  key, k1 = jax.random.split(key)
  return FreewayState(
      chicken_y=jnp.asarray(START_Y, jnp.float32),
      car_x=jax.random.uniform(k1, (NUM_LANES,), minval=0.0, maxval=160.0),
      frame=jnp.zeros((), jnp.int32),
      key=key,
  )


def freeway_step(state: FreewayState, action: jax.Array):
  up = action == 1
  down = action == 2
  dy = jnp.where(up, -CHICKEN_SPEED, jnp.where(down, CHICKEN_SPEED, 0.0))
  cy = jnp.clip(state.chicken_y + dy, GOAL_Y - 2.0, START_Y)

  # Traffic: one car per lane, constant per-lane speed, wraps around.
  speeds = jnp.asarray(LANE_SPEEDS, jnp.float32)
  dirs = jnp.asarray([1.0] * 5 + [-1.0] * 5, jnp.float32)
  car_x = jnp.mod(state.car_x + dirs * speeds, 160.0)

  # Collision: chicken box vs the car in each lane (cars never overlap the
  # chicken across the x-wrap seam because CHICKEN_X is mid-screen).
  lane_y = _lane_tops()
  overlap_y = (cy + CHICKEN_H >= lane_y) & (cy <= lane_y + CAR_H)
  overlap_x = (car_x <= CHICKEN_X + CHICKEN_W) & (car_x + CAR_W >= CHICKEN_X)
  hit = (overlap_y & overlap_x).any()
  cy = jnp.where(hit, jnp.minimum(cy + KNOCKBACK, START_Y), cy)

  # Crossing: +1 and teleport back to the start (ALE behavior).
  crossed = cy <= GOAL_Y
  reward = jnp.where(crossed, 1.0, 0.0)
  cy = jnp.where(crossed, START_Y, cy)

  frame = state.frame + 1
  done = frame >= EPISODE_FRAMES

  new_state = FreewayState(cy, car_x, frame, state.key)
  return new_state, reward, done, jnp.zeros((), jnp.bool_)


def freeway_render(state: FreewayState) -> jax.Array:
  bg = (142, 142, 142)  # road grey
  grass = (render.rect_mask(0, LANE_TOP, 0, 160)
           | render.rect_mask(ROAD_BOTTOM, 210, 0, 160))
  # Lane divider stripes every other lane boundary.
  stripes = jnp.zeros((210, 160), jnp.bool_)
  for i in range(1, NUM_LANES):
    stripes = stripes | render.rect_mask(LANE_TOP + i * LANE_H,
                                         LANE_TOP + i * LANE_H + 1, 0, 160)
  median = render.rect_mask(LANE_TOP + 5 * LANE_H - 1,
                            LANE_TOP + 5 * LANE_H + 1, 0, 160)

  frame = render.compose(
      bg,
      (grass, (110, 156, 66)),
      (stripes, (214, 214, 214)),
      (median, (255, 255, 255)),
  )
  lane_y = _lane_tops()
  for i in range(NUM_LANES):
    car = render.rect_mask(lane_y[i], lane_y[i] + CAR_H,
                           state.car_x[i], state.car_x[i] + CAR_W)
    frame = jnp.where(car[..., None],
                      jnp.asarray(CAR_COLORS[i], jnp.uint8), frame)
  chicken = render.rect_mask(state.chicken_y, state.chicken_y + CHICKEN_H,
                             CHICKEN_X, CHICKEN_X + CHICKEN_W)
  return jnp.where(chicken[..., None],
                   jnp.asarray((252, 252, 84), jnp.uint8), frame)


GAME = register_game(Game(
    name="freeway",
    num_actions=3,
    init=freeway_init,
    step=freeway_step,
    render=freeway_render,
))
