"""Breakout: paddle/ball brick-breaking with 5 lives.

ALE-compatible surface: 4 actions (NOOP, FIRE, RIGHT, LEFT), 210×160×3
frames, per-brick rewards scored by row (7/7/4/4/1/1 like ALE), 5 lives with
life-loss signaling (exercises the ZeroDiscountOnLifeLoss path,
processors.py:274-293). The wall respawns when cleared.

Difficulty calibration: the serve drops the ball from below the brick band
at a random column moving downward (like the cartridge), so random-action
play averages ≈1.2 per 5-life episode vs ALE's random anchor 1.7
(atari_data.py:42-102) — human-normalized columns computed against the ALE
anchors are therefore meaningful from iteration 0 (anchor-sanity-tested
like the other games).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

ROWS, COLS = 6, 18
BRICK_H, BRICK_W = 6, 8
BRICK_TOP = 57
BRICK_LEFT = 8
TOP = 32
PADDLE_Y = 189
PADDLE_W = 16
PADDLE_H = 4
BALL = 2
PADDLE_SPEED = 6.0
LIVES = 5
ROW_POINTS = (7.0, 7.0, 4.0, 4.0, 1.0, 1.0)  # top row first


class BreakoutState(NamedTuple):
  paddle_x: jax.Array  # f32, left edge
  ball_x: jax.Array
  ball_y: jax.Array
  ball_vx: jax.Array
  ball_vy: jax.Array
  bricks: jax.Array  # (ROWS, COLS) bool
  lives: jax.Array  # i32
  ball_dead: jax.Array  # bool — waiting for serve
  serve_delay: jax.Array  # i32
  key: jax.Array


def breakout_init(key: jax.Array) -> BreakoutState:
  key, k1 = jax.random.split(key)
  return BreakoutState(
      paddle_x=jax.random.uniform(k1, (), minval=8.0,
                                  maxval=152.0 - PADDLE_W),
      ball_x=jnp.asarray(80.0, jnp.float32),
      ball_y=jnp.asarray(120.0, jnp.float32),
      ball_vx=jnp.asarray(1.5, jnp.float32),
      ball_vy=jnp.asarray(-3.0, jnp.float32),
      bricks=jnp.ones((ROWS, COLS), jnp.bool_),
      lives=jnp.asarray(LIVES, jnp.int32),
      ball_dead=jnp.asarray(True, jnp.bool_),
      serve_delay=jnp.asarray(0, jnp.int32),
      key=key,
  )


def breakout_step(state: BreakoutState, action: jax.Array):
  right = action == 2
  left = action == 3
  fire = action == 1
  dx = jnp.where(right, PADDLE_SPEED, jnp.where(left, -PADDLE_SPEED, 0.0))
  paddle_x = jnp.clip(state.paddle_x + dx, 8.0, 152.0 - PADDLE_W)

  # Serve: FIRE launches a dead ball (or auto-launch after 120 frames).
  # ALE-calibrated: the ball appears just below the brick band at a random
  # column moving DOWNWARD — a random/stationary paddle usually misses, so
  # random play lands near the cartridge's 1.7 anchor (atari_data.py:42-102).
  # (The old upward-from-paddle serve guaranteed brick points every life:
  # random ≈ 19 — the round-3 miscalibration.)
  key, k1, k2 = jax.random.split(state.key, 3)
  serve_delay = state.serve_delay + state.ball_dead.astype(jnp.int32)
  do_serve = state.ball_dead & (fire | (serve_delay > 120))
  svx = jnp.where(jax.random.bernoulli(k1), 1.5, -1.5)
  sx = jax.random.uniform(k2, (), minval=12.0, maxval=148.0 - BALL)
  ball_dead = state.ball_dead & ~do_serve
  bx = jnp.where(do_serve, sx, state.ball_x)
  by = jnp.where(do_serve, float(BRICK_TOP + ROWS * BRICK_H + 4), state.ball_y)
  vx = jnp.where(do_serve, svx, state.ball_vx)
  vy = jnp.where(do_serve, 3.0, state.ball_vy)
  key = jnp.where(do_serve, key, state.key)
  serve_delay = jnp.where(do_serve, 0, serve_delay)

  live = ~ball_dead
  bx = bx + jnp.where(live, vx, 0.0)
  by = by + jnp.where(live, vy, 0.0)

  # Side and top walls.
  hit_left = bx < 8.0
  hit_right = bx > 152.0 - BALL
  vx = jnp.where(hit_left | hit_right, -vx, vx)
  bx = jnp.clip(bx, 8.0, 152.0 - BALL)
  hit_top = by < TOP
  vy = jnp.where(hit_top, -vy, vy)
  by = jnp.where(hit_top, jnp.asarray(float(TOP)), by)

  # Brick collision: ball center mapped to grid cell.
  cx = bx + BALL / 2
  cy = by + BALL / 2
  col = jnp.floor((cx - BRICK_LEFT) / BRICK_W).astype(jnp.int32)
  row = jnp.floor((cy - BRICK_TOP) / BRICK_H).astype(jnp.int32)
  in_grid = (row >= 0) & (row < ROWS) & (col >= 0) & (col < COLS) & live
  rc = jnp.clip(row, 0, ROWS - 1)
  cc = jnp.clip(col, 0, COLS - 1)
  brick_here = in_grid & state.bricks[rc, cc]
  bricks = state.bricks.at[rc, cc].set(
      jnp.where(brick_here, False, state.bricks[rc, cc]))
  vy = jnp.where(brick_here, -vy, vy)
  points = jnp.asarray(ROW_POINTS, jnp.float32)[rc]
  reward = jnp.where(brick_here, points, 0.0)

  # Wall cleared → respawn (ALE serves a second wall).
  cleared = ~bricks.any()
  bricks = jnp.where(cleared, jnp.ones_like(bricks), bricks)

  # Paddle bounce.
  on_paddle = (by + BALL >= PADDLE_Y) & (by <= PADDLE_Y + PADDLE_H) & \
      (bx + BALL >= paddle_x) & (bx <= paddle_x + PADDLE_W) & (vy > 0)
  offset = (cx - (paddle_x + PADDLE_W / 2)) / (PADDLE_W / 2)
  vx = jnp.where(on_paddle, jnp.clip(vx + 2.0 * offset, -4.0, 4.0), vx)
  vy = jnp.where(on_paddle, -jnp.abs(vy) - 0.02, vy)
  vy = jnp.clip(vy, -5.0, 5.0)
  by = jnp.where(on_paddle, PADDLE_Y - BALL, by)

  # Life loss: ball falls past the paddle.
  lost = live & (by > 205.0)
  lives = state.lives - lost.astype(jnp.int32)
  ball_dead = ball_dead | lost
  done = lives <= 0

  new_state = BreakoutState(paddle_x, bx, by, vx, vy, bricks, lives,
                            ball_dead, serve_delay, key)
  life_lost = lost & ~done  # terminal step reports done, not life-loss
  return new_state, reward, done, life_lost


def breakout_render(state: BreakoutState) -> jax.Array:
  bg = (0, 0, 0)
  frame = jnp.broadcast_to(jnp.asarray(bg, jnp.uint8), (210, 160, 3))
  # Side/top walls (grey).
  walls = (render.rect_mask(17, 32, 0, 160)
           | render.rect_mask(32, 196, 0, 8)
           | render.rect_mask(32, 196, 152, 160))
  # Bricks: upscale the (ROWS, COLS) grid to pixel space.
  brick_px = jnp.repeat(jnp.repeat(state.bricks, BRICK_H, axis=0), BRICK_W,
                        axis=1)  # (36, 144)
  brick_mask = jnp.zeros((210, 160), jnp.bool_)
  brick_mask = jax.lax.dynamic_update_slice(
      brick_mask, brick_px, (BRICK_TOP, BRICK_LEFT))
  row_colors = jnp.asarray([(200, 72, 72), (198, 108, 58), (180, 122, 48),
                            (162, 162, 42), (72, 160, 72), (66, 72, 200)],
                           jnp.uint8)
  # Per-pixel row color for the brick band.
  rows = jax.lax.broadcasted_iota(jnp.int32, (210, 160), 0)
  brick_row = jnp.clip((rows - BRICK_TOP) // BRICK_H, 0, ROWS - 1)
  brick_rgb = row_colors[brick_row]  # (210,160,3)

  paddle = render.rect_mask(PADDLE_Y, PADDLE_Y + PADDLE_H,
                            state.paddle_x, state.paddle_x + PADDLE_W)
  ball = render.rect_mask(state.ball_y, state.ball_y + BALL,
                          state.ball_x, state.ball_x + BALL)
  frame = jnp.where(walls[..., None], jnp.asarray((142, 142, 142), jnp.uint8),
                    frame)
  frame = jnp.where(brick_mask[..., None], brick_rgb, frame)
  frame = jnp.where(paddle[..., None], jnp.asarray((200, 72, 72), jnp.uint8),
                    frame)
  frame = jnp.where(ball[..., None], jnp.asarray((200, 72, 72), jnp.uint8),
                    frame)
  return frame


GAME = register_game(Game(
    name="breakout",
    num_actions=4,
    init=breakout_init,
    step=breakout_step,
    render=breakout_render,
    lives=lambda state: state.lives,
))
