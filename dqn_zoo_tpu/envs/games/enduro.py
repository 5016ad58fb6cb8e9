"""Enduro: overtake traffic on an endless highway against the clock.

ALE-compatible surface: 9 actions (NOOP, FIRE=accelerate, RIGHT, LEFT,
DOWN=brake, DOWNRIGHT, DOWNLEFT, RIGHTFIRE, LEFTFIRE — the cartridge's
minimal set, gym_atari.py:37-61 registers `EnduroNoFrameskip-v4`),
210×160×3 frames, +1 per car overtaken and −1 when a car re-passes you,
no lives, fixed-length timed episode. Random play scores ≈0 (it barely
accelerates, so nothing is overtaken) and the human anchor is 860.5
(atari_data.py:42-102): sustained scoring requires holding FIRE while
steering around traffic, and collisions drop speed to a crawl.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

ROAD_TOP = 54.0  # horizon line
ROAD_BOTTOM = 182.0
NUM_LANES = 3
LANE_X = (52.0, 76.0, 100.0)  # lane center x at the bottom of the screen
CAR_W, CAR_H = 14, 10
PLAYER_Y = 160.0
PLAYER_SPEED_X = 2.5
MAX_SPEED = 6.0
MIN_SPEED = 0.0
ACCEL = 0.08
BRAKE = 0.2
DRAG = 0.02
TRAFFIC_SPEED = 2.4  # traffic's own forward speed (world units/frame)
CRASH_SPEED = 0.8  # speed after a collision
NUM_CARS = 6
SPAWN_AHEAD = 400.0  # world-z band in which traffic lives, ahead and behind
EPISODE_FRAMES = 10000
CAR_COLORS = ((192, 88, 88), (88, 120, 192), (104, 172, 104),
              (184, 150, 70), (150, 110, 180), (180, 180, 92))


class EnduroState(NamedTuple):
  player_x: jax.Array  # f32, screen x of the player car's center
  speed: jax.Array  # f32, world units/frame
  car_z: jax.Array  # (NUM_CARS,) f32, world distance ahead (+) of the player
  car_lane: jax.Array  # (NUM_CARS,) i32
  passed: jax.Array  # i32, net cars overtaken
  frame: jax.Array  # i32
  key: jax.Array


def _respawn(key, n):
  kz, kl = jax.random.split(key)
  z = jax.random.uniform(kz, (n,), minval=SPAWN_AHEAD * 0.5,
                         maxval=SPAWN_AHEAD)
  lane = jax.random.randint(kl, (n,), 0, NUM_LANES)
  return z, lane


def enduro_init(key: jax.Array) -> EnduroState:
  key, k1 = jax.random.split(key)
  z, lane = _respawn(k1, NUM_CARS)
  return EnduroState(
      player_x=jnp.asarray(LANE_X[1], jnp.float32),
      speed=jnp.asarray(CRASH_SPEED, jnp.float32),
      car_z=z,
      car_lane=lane,
      passed=jnp.zeros((), jnp.int32),
      frame=jnp.zeros((), jnp.int32),
      key=key,
  )


def enduro_step(state: EnduroState, action: jax.Array):
  fire = jnp.isin(action, jnp.asarray([1, 7, 8]))
  right = jnp.isin(action, jnp.asarray([2, 5, 7]))
  left = jnp.isin(action, jnp.asarray([3, 6, 8]))
  brake = jnp.isin(action, jnp.asarray([4, 5, 6]))

  speed = state.speed + jnp.where(fire, ACCEL, 0.0) \
      - jnp.where(brake, BRAKE, 0.0) - DRAG
  speed = jnp.clip(speed, MIN_SPEED, MAX_SPEED)
  px = jnp.clip(state.player_x
                + (right.astype(jnp.float32)
                   - left.astype(jnp.float32)) * PLAYER_SPEED_X,
                LANE_X[0] - 10.0, LANE_X[-1] + 10.0)

  # Traffic approaches at the relative speed; z is distance ahead of us.
  rel = speed - TRAFFIC_SPEED
  car_z = state.car_z - rel

  # Overtake events: car crosses from ahead to behind (+1) or back (−1).
  crossed_down = (state.car_z > 0.0) & (car_z <= 0.0)
  crossed_up = (state.car_z <= 0.0) & (car_z > 0.0)

  # Collision: a car crossing (or sitting at) our z in our lane. Lane width
  # check is in screen space at the player's row.
  lane_x = jnp.asarray(LANE_X, jnp.float32)[state.car_lane]
  same_lane = jnp.abs(lane_x - px) < CAR_W
  hit = ((crossed_down | crossed_up | (jnp.abs(car_z) < 2.0)) & same_lane)
  any_hit = hit.any()
  # A collision drops us to a crawl and shoves the traffic car ahead.
  speed = jnp.where(any_hit, CRASH_SPEED, speed)
  car_z = jnp.where(hit, 12.0, car_z)

  # Scoring counts only clean crossings.
  gained = (crossed_down & ~hit).sum().astype(jnp.int32)
  lost = (crossed_up & ~hit).sum().astype(jnp.int32)
  reward = (gained - lost).astype(jnp.float32)
  passed = state.passed + gained - lost

  # Cars far behind respawn ahead in a random lane.
  key, k1, k2 = jax.random.split(state.key, 3)
  new_z = jax.random.uniform(k1, (NUM_CARS,), minval=SPAWN_AHEAD * 0.6,
                             maxval=SPAWN_AHEAD)
  new_lane = jax.random.randint(k2, (NUM_CARS,), 0, NUM_LANES)
  recycle = car_z < -60.0
  car_z = jnp.where(recycle, new_z, car_z)
  car_lane = jnp.where(recycle, new_lane, state.car_lane)

  frame = state.frame + 1
  done = frame >= EPISODE_FRAMES

  new_state = EnduroState(px, speed, car_z, car_lane, passed, frame, key)
  return new_state, reward, done, jnp.zeros((), jnp.bool_)


def enduro_render(state: EnduroState) -> jax.Array:
  sky = render.rect_mask(0, ROAD_TOP, 0, 160)
  # Road edges converge toward the horizon: approximate with three nested
  # trapezoid bands (rect masks at decreasing widths).
  road = (render.rect_mask(ROAD_TOP, 100, 56, 104)
          | render.rect_mask(100, 140, 44, 116)
          | render.rect_mask(140, ROAD_BOTTOM, 32, 128))
  frame = render.compose(
      (110, 156, 66),  # grass
      (sky, (120, 168, 224)),
      (road, (105, 105, 105)),
  )
  # Traffic: perspective scale by world distance (nearer → lower and wider).
  t = jnp.clip(state.car_z, 0.0, SPAWN_AHEAD) / SPAWN_AHEAD  # 0 near, 1 far
  y = PLAYER_Y - (PLAYER_Y - ROAD_TOP - 4.0) * jnp.sqrt(t)
  scale = 1.0 - 0.7 * jnp.sqrt(t)
  lane_x = jnp.asarray(LANE_X, jnp.float32)[state.car_lane]
  # Lanes pinch toward the center line (80) with distance.
  x = 80.0 + (lane_x - 80.0) * (1.0 - 0.6 * jnp.sqrt(t))
  behind = state.car_z <= 0.0
  for i in range(NUM_CARS):
    w = CAR_W * scale[i] / 2.0
    h = CAR_H * scale[i]
    car = render.rect_mask(y[i] - h, y[i], x[i] - w, x[i] + w)
    car = car & ~behind[i]  # cars behind us are off-screen
    frame = jnp.where(car[..., None],
                      jnp.asarray(CAR_COLORS[i], jnp.uint8), frame)
  player = render.rect_mask(PLAYER_Y, PLAYER_Y + CAR_H,
                            state.player_x - CAR_W / 2,
                            state.player_x + CAR_W / 2)
  # Odometer bar: net cars overtaken.
  bar = render.rect_mask(192, 198, 16, 16 + jnp.clip(state.passed, 0, 128))
  frame = jnp.where(player[..., None],
                    jnp.asarray((236, 200, 96), jnp.uint8), frame)
  return jnp.where(bar[..., None],
                   jnp.asarray((236, 236, 236), jnp.uint8), frame)


GAME = register_game(Game(
    name="enduro",
    num_actions=9,
    init=enduro_init,
    step=enduro_step,
    render=enduro_render,
))
