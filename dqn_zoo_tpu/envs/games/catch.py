"""Catch: minimal falling-ball game for fast smoke tests.

One ball falls from the top in a random column; move the paddle under it.
Reward +1 on catch, −1 on miss; the episode ends after one drop. Learnable
by DQN in a few thousand frames — the cheapest end-to-end learning signal.
3 actions (NOOP, LEFT, RIGHT) — note unlike ALE games, this is our own
minimal game (the reference has no equivalent; its tests use real Pong).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

COLS = 5
CELL_W = 32  # 5 × 32 = 160
BALL_SIZE = 16
PADDLE_Y = 190
FALL_SPEED = 2.0
# Columns per RAW frame. The wrapper repeats actions 4×, so one agent-step
# moves exactly one column — every column stays reachable (a whole-column
# per-frame speed made only the edges reachable under action repeat).
PADDLE_SPEED = 0.25


class CatchState(NamedTuple):
  ball_col: jax.Array  # i32
  ball_y: jax.Array  # f32
  paddle_pos: jax.Array  # f32 — column position (rounded for catching)
  key: jax.Array


def catch_init(key: jax.Array) -> CatchState:
  key, k1, k2 = jax.random.split(key, 3)
  return CatchState(
      ball_col=jax.random.randint(k1, (), 0, COLS),
      ball_y=jnp.asarray(20.0, jnp.float32),
      paddle_pos=jax.random.randint(k2, (), 0, COLS).astype(jnp.float32),
      key=key,
  )


def catch_step(state: CatchState, action: jax.Array):
  move = jnp.where(action == 1, -PADDLE_SPEED,
                   jnp.where(action == 2, PADDLE_SPEED, 0.0))
  paddle_pos = jnp.clip(state.paddle_pos + move, 0.0, COLS - 1.0)
  ball_y = state.ball_y + FALL_SPEED
  done = ball_y >= PADDLE_Y
  paddle_col = jnp.round(paddle_pos).astype(jnp.int32)
  caught = done & (paddle_col == state.ball_col)
  reward = jnp.where(done, jnp.where(caught, 1.0, -1.0), 0.0)
  new_state = CatchState(state.ball_col, ball_y, paddle_pos, state.key)
  return new_state, reward, done, jnp.zeros((), jnp.bool_)


def catch_render(state: CatchState) -> jax.Array:
  ball_x = state.ball_col * CELL_W + (CELL_W - BALL_SIZE) // 2
  paddle_x = state.paddle_pos * CELL_W
  ball = render.rect_mask(state.ball_y, state.ball_y + BALL_SIZE,
                          ball_x, ball_x + BALL_SIZE)
  paddle = render.rect_mask(PADDLE_Y, PADDLE_Y + 8, paddle_x,
                            paddle_x + CELL_W)
  return render.compose((0, 0, 0),
                        (ball, (236, 236, 236)),
                        (paddle, (92, 186, 92)))


GAME = register_game(Game(
    name="catch",
    num_actions=3,
    init=catch_init,
    step=catch_step,
    render=catch_render,
))
