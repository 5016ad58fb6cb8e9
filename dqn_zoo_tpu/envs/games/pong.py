"""Pong: two-paddle ball game, first to 21 points.

ALE-compatible surface: 6 actions (NOOP, FIRE, RIGHT=up, LEFT=down,
RIGHTFIRE, LEFTFIRE), 210×160×3 uint8 frames, reward ±1 per point, no lives.
The opponent is a speed-limited ball tracker, so it is beatable but not
trivially (random play loses ≈ −21, mirroring ALE pong's random score of
−20.7, atari_data.py:42-102).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

# Playfield geometry (pixels).
TOP = 34
BOTTOM = 194
PADDLE_H = 16
PADDLE_W = 4
BALL = 4
PLAYER_X = 140.0
ENEMY_X = 16.0
PLAYER_SPEED = 4.0
ENEMY_SPEED = 3.0
BALL_SPEED_X = 3.0
WIN_SCORE = 21


class PongState(NamedTuple):
  player_y: jax.Array  # f32, paddle top
  enemy_y: jax.Array
  ball_x: jax.Array
  ball_y: jax.Array
  ball_vx: jax.Array
  ball_vy: jax.Array
  player_score: jax.Array  # i32
  enemy_score: jax.Array  # i32
  serve_delay: jax.Array  # i32, frames until ball is live
  key: jax.Array


def _serve(key, toward_player):
  """Ball velocity for a new serve."""
  key, k1 = jax.random.split(key)
  vy = jax.random.uniform(k1, (), minval=-2.0, maxval=2.0)
  vx = jnp.where(toward_player, BALL_SPEED_X, -BALL_SPEED_X)
  return key, vx, vy


def pong_init(key: jax.Array) -> PongState:
  key, k1, k2, k3 = jax.random.split(key, 4)
  key, vx, vy = _serve(key, jax.random.bernoulli(k1))
  # Randomized initial ball height and short serve delay so that noop starts
  # (gym_atari.py:128-216) actually diversify the first visible frames.
  ball_y = jax.random.uniform(k2, (), minval=float(TOP) + 20.0,
                              maxval=float(BOTTOM) - 24.0)
  return PongState(
      player_y=jnp.asarray((TOP + BOTTOM) / 2 - PADDLE_H / 2, jnp.float32),
      enemy_y=jnp.asarray((TOP + BOTTOM) / 2 - PADDLE_H / 2, jnp.float32),
      ball_x=jnp.asarray(80.0, jnp.float32),
      ball_y=ball_y,
      ball_vx=vx,
      ball_vy=vy,
      player_score=jnp.zeros((), jnp.int32),
      enemy_score=jnp.zeros((), jnp.int32),
      serve_delay=jax.random.randint(k3, (), 2, 12),
      key=key,
  )


def pong_step(state: PongState, action: jax.Array):
  # Player paddle: RIGHT(2)/RIGHTFIRE(4) move up, LEFT(3)/LEFTFIRE(5) down.
  up = (action == 2) | (action == 4)
  down = (action == 3) | (action == 5)
  dy = jnp.where(up, -PLAYER_SPEED, jnp.where(down, PLAYER_SPEED, 0.0))
  player_y = jnp.clip(state.player_y + dy, TOP, BOTTOM - PADDLE_H)

  # Enemy paddle tracks the ball with limited speed and a small deadzone.
  target = state.ball_y - PADDLE_H / 2
  diff = target - state.enemy_y
  edy = jnp.clip(diff, -ENEMY_SPEED, ENEMY_SPEED)
  edy = jnp.where(jnp.abs(diff) < 2.0, 0.0, edy)
  enemy_y = jnp.clip(state.enemy_y + edy, TOP, BOTTOM - PADDLE_H)

  live = state.serve_delay <= 0
  serve_delay = jnp.maximum(state.serve_delay - 1, 0)
  bx = state.ball_x + jnp.where(live, state.ball_vx, 0.0)
  by = state.ball_y + jnp.where(live, state.ball_vy, 0.0)
  vx, vy = state.ball_vx, state.ball_vy

  # Wall bounce.
  hit_top = by < TOP
  hit_bot = by > BOTTOM - BALL
  vy = jnp.where(hit_top | hit_bot, -vy, vy)
  by = jnp.clip(by, TOP, BOTTOM - BALL)

  # Player paddle bounce (ball moving right, overlapping paddle column).
  overlap_p = (bx + BALL >= PLAYER_X) & (bx <= PLAYER_X + PADDLE_W) & \
      (by + BALL >= player_y) & (by <= player_y + PADDLE_H) & (vx > 0)
  # English: deflection proportional to hit offset from paddle center.
  offset_p = (by + BALL / 2 - (player_y + PADDLE_H / 2)) / (PADDLE_H / 2)
  vy = jnp.where(overlap_p, jnp.clip(vy + 2.0 * offset_p, -4.0, 4.0), vy)
  vx = jnp.where(overlap_p, -jnp.minimum(jnp.abs(vx) + 0.15, 5.0), vx)
  bx = jnp.where(overlap_p, PLAYER_X - BALL, bx)

  # Enemy paddle bounce (ball moving left).
  overlap_e = (bx <= ENEMY_X + PADDLE_W) & (bx + BALL >= ENEMY_X) & \
      (by + BALL >= enemy_y) & (by <= enemy_y + PADDLE_H) & (vx < 0)
  offset_e = (by + BALL / 2 - (enemy_y + PADDLE_H / 2)) / (PADDLE_H / 2)
  vy = jnp.where(overlap_e, jnp.clip(vy + 2.0 * offset_e, -4.0, 4.0), vy)
  vx = jnp.where(overlap_e, jnp.minimum(jnp.abs(vx) + 0.15, 5.0), vx)
  bx = jnp.where(overlap_e, ENEMY_X + PADDLE_W, bx)

  # Scoring.
  player_point = bx < 0.0
  enemy_point = bx > 160.0 - BALL
  reward = jnp.where(player_point, 1.0, jnp.where(enemy_point, -1.0, 0.0))
  player_score = state.player_score + player_point.astype(jnp.int32)
  enemy_score = state.enemy_score + enemy_point.astype(jnp.int32)

  scored = player_point | enemy_point
  key, svx, svy = _serve(state.key, enemy_point)  # serve toward scorer's foe
  bx = jnp.where(scored, 80.0, bx)
  by = jnp.where(scored, (TOP + BOTTOM) / 2.0, by)
  vx = jnp.where(scored, svx, vx)
  vy = jnp.where(scored, svy, vy)
  key = jnp.where(scored, key, state.key)
  serve_delay = jnp.where(scored, 30, serve_delay)

  done = (player_score >= WIN_SCORE) | (enemy_score >= WIN_SCORE)
  new_state = PongState(player_y, enemy_y, bx, by, vx, vy, player_score,
                        enemy_score, serve_delay, key)
  return new_state, reward, done, jnp.zeros((), jnp.bool_)


def pong_render(state: PongState) -> jax.Array:
  bg = (144, 72, 17)  # ALE pong brown background
  wall = render.rect_mask(24, TOP, 0, 160) | render.rect_mask(BOTTOM, 200, 0,
                                                              160)
  player = render.rect_mask(state.player_y, state.player_y + PADDLE_H,
                            PLAYER_X, PLAYER_X + PADDLE_W)
  enemy = render.rect_mask(state.enemy_y, state.enemy_y + PADDLE_H,
                           ENEMY_X, ENEMY_X + PADDLE_W)
  ball = render.rect_mask(state.ball_y, state.ball_y + BALL,
                          state.ball_x, state.ball_x + BALL)
  return render.compose(
      bg,
      (wall, (236, 236, 236)),
      (enemy, (213, 130, 74)),
      (player, (92, 186, 92)),
      (ball, (236, 236, 236)),
  )


GAME = register_game(Game(
    name="pong",
    num_actions=6,
    init=pong_init,
    step=pong_step,
    render=pong_render,
))
