"""Skiing: slalom downhill against the clock; missed gates cost 5 seconds.

ALE-compatible surface: 3 actions (NOOP, RIGHT, LEFT — ALE's minimal set),
210×160×3 frames, no lives. Like the cartridge's slalom mode: the skier
descends a fixed-length course through 20 gates; the episode's ONLY reward
arrives at the finish line and equals −(elapsed centiseconds + 500 per
missed gate) — the clipped-reward learning signal is therefore a single −1
at episode end, which is why Skiing is famously hard for DQN (anchors,
atari_data.py: random ≈ −17098, human ≈ −4337; our parameterization lands
straight-line play near −9000 and clean slalom near −4500).

Descent speed depends on attitude: pointing downhill is fast (3 px/frame),
turning carves at 1.2 px/frame, so time optimization vs gate completion is
the same tradeoff as the cartridge's.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

COURSE_LEN = 6000.0  # world px top to bottom
NUM_GATES = 20
GATE_SPACING = COURSE_LEN / (NUM_GATES + 1)
GATE_HALF_W = 12.0  # post center offset from gate center
POST_W, POST_H = 3, 8
SKIER_X_MIN, SKIER_X_MAX = 8.0, 152.0
SKIER_Y = 60  # screen row of the skier
SKIER_W, SKIER_H = 6, 10
SPEED_STRAIGHT = 3.0
SPEED_TURN = 1.2
TURN_RATE = 2.0  # px/frame horizontal carve
CS_PER_FRAME = 100.0 / 60.0  # centiseconds per frame at 60 Hz
MISS_PENALTY_CS = 500.0
TREE_COLOR = (38, 110, 38)
POST_COLOR = (66, 72, 200)
SKIER_COLOR = (214, 92, 92)


class SkiingState(NamedTuple):
  skier_x: jax.Array  # f32 — screen x of skier center
  course_y: jax.Array  # f32 — world y at the skier's row
  gate_x: jax.Array  # (NUM_GATES,) f32 — gate center x
  gate_passed: jax.Array  # (NUM_GATES,) bool
  gate_judged: jax.Array  # (NUM_GATES,) bool — crossed the skier's row
  frames: jax.Array  # i32
  key: jax.Array


def skiing_init(key: jax.Array) -> SkiingState:
  key, kg = jax.random.split(key)
  # Gate centers wander within the course width.
  gx = jax.random.uniform(kg, (NUM_GATES,), minval=SKIER_X_MIN + 20.0,
                          maxval=SKIER_X_MAX - 20.0)
  return SkiingState(
      skier_x=jnp.asarray(80.0, jnp.float32),
      course_y=jnp.zeros((), jnp.float32),
      gate_x=gx,
      gate_passed=jnp.zeros((NUM_GATES,), jnp.bool_),
      gate_judged=jnp.zeros((NUM_GATES,), jnp.bool_),
      frames=jnp.zeros((), jnp.int32),
      key=key,
  )


def _gate_world_y() -> jax.Array:
  return (jnp.arange(NUM_GATES, dtype=jnp.float32) + 1.0) * GATE_SPACING


def skiing_step(state: SkiingState, action: jax.Array):
  right = action == 1
  left = action == 2
  turning = right | left
  dx = jnp.where(right, TURN_RATE, 0.0) - jnp.where(left, TURN_RATE, 0.0)
  sx = jnp.clip(state.skier_x + dx, SKIER_X_MIN, SKIER_X_MAX)
  vy = jnp.where(turning, SPEED_TURN, SPEED_STRAIGHT)
  cy = state.course_y + vy

  # Judge each gate the frame its world y crosses the skier's row.
  gy = _gate_world_y()
  crossing = ~state.gate_judged & (gy <= cy)
  within = jnp.abs(state.gate_x - sx) <= GATE_HALF_W
  passed = state.gate_passed | (crossing & within)
  judged = state.gate_judged | crossing

  frames = state.frames + 1
  done = cy >= COURSE_LEN
  missed = jnp.sum((~passed).astype(jnp.float32))  # unjudged count as missed
  elapsed_cs = frames.astype(jnp.float32) * CS_PER_FRAME
  reward = jnp.where(done, -(elapsed_cs + MISS_PENALTY_CS * missed), 0.0)

  new_state = SkiingState(sx, cy, state.gate_x, passed, judged, frames,
                          state.key)
  return new_state, reward, done, jnp.zeros((), jnp.bool_)


def skiing_render(state: SkiingState) -> jax.Array:
  bg = (236, 236, 236)  # snow
  frame = render.compose(bg)
  # Tree borders mark the course edges.
  trees = (render.rect_mask(0, 210, 0, int(SKIER_X_MIN) - 2)
           | render.rect_mask(0, 210, int(SKIER_X_MAX) + 2, 160))
  frame = jnp.where(trees[..., None], jnp.asarray(TREE_COLOR, jnp.uint8),
                    frame)
  # Gates whose world y is within the visible window below the skier.
  gy = _gate_world_y()
  screen_y = SKIER_Y + (gy - state.course_y)  # px below skier row
  for i in range(NUM_GATES):
    visible = (screen_y[i] >= 0.0) & (screen_y[i] < 204.0)
    for sign in (-1.0, 1.0):
      post_x = state.gate_x[i] + sign * GATE_HALF_W
      p = render.rect_mask(screen_y[i], screen_y[i] + POST_H,
                           post_x - POST_W / 2, post_x + POST_W / 2)
      p = p & jnp.broadcast_to(visible & ~state.gate_judged[i], (210, 160))
      frame = jnp.where(p[..., None], jnp.asarray(POST_COLOR, jnp.uint8),
                        frame)
  skier = render.rect_mask(SKIER_Y, SKIER_Y + SKIER_H,
                           state.skier_x - SKIER_W / 2,
                           state.skier_x + SKIER_W / 2)
  return jnp.where(skier[..., None], jnp.asarray(SKIER_COLOR, jnp.uint8),
                   frame)


GAME = register_game(Game(
    name="skiing",
    num_actions=3,
    init=skiing_init,
    step=skiing_step,
    render=skiing_render,
))
