"""Bowling: ten frames of aim-and-roll at a ten-pin triangle.

ALE-compatible surface: 6 actions (NOOP, FIRE, UP, RIGHT, LEFT, DOWN — the
cartridge's minimal set, gym_atari.py:37-61 registers
`BowlingNoFrameskip-v4`), 210×160×3 frames. The player positions the
bowler vertically, FIRE releases the ball, and one UP/DOWN input while the
ball rolls hooks its path. Points land as pins fall, with a +10 strike /
+5 spare bonus paid at the end of a frame (a simplified form of the
cartridge's deferred bonus scoring that preserves its scale: ALE random
anchor 23.1, human 160.7, atari_data.py:42-102 — random rolls mostly
gutter or clip a pin or two; skilled play strikes repeatedly).

Dynamics are fixed-shape: a (10,) pin mask in the classic triangle, one
ball with position/velocity/hook, phase encoded in scalars — every step is
where/clip logic, fully vectorizable under vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

LANE_TOP, LANE_BOT = 60.0, 160.0
BOWLER_X = 24.0
PIN_X0 = 120.0  # nearest pin column
PIN_DX = 9.0
PIN_DY = 11.0
PIN_CY = 110.0  # lane vertical center
BALL_SPEED = 3.0
HOOK_VY = 0.9
PIN_RADIUS = 6.0
ROLLS_PER_FRAME = 2
NUM_FRAMES = 10
STRIKE_BONUS = 10.0
SPARE_BONUS = 5.0
SETTLE_FRAMES = 40  # pause between rolls

# Pin triangle: columns of 1,2,3,4 pins, pointing at the bowler.
_PIN_POS = []
for col in range(4):
  for row in range(col + 1):
    _PIN_POS.append((PIN_X0 + col * PIN_DX,
                     PIN_CY + (row - col / 2.0) * PIN_DY))
_PIN_XY = np.asarray(_PIN_POS, np.float32)  # (10, 2)


class BowlingState(NamedTuple):
  bowler_y: jax.Array  # f32
  ball_x: jax.Array  # f32 (<0 = not rolling)
  ball_y: jax.Array
  ball_vy: jax.Array  # hook velocity
  hooked: jax.Array  # bool, hook input consumed for this roll
  pins: jax.Array  # (10,) bool, standing
  frame_no: jax.Array  # i32, 0..9
  roll_no: jax.Array  # i32, 0..1
  pins_this_frame: jax.Array  # i32, downed so far this frame
  settle: jax.Array  # i32, pause counter
  frame: jax.Array  # i32 raw frame counter
  key: jax.Array


def bowling_init(key: jax.Array) -> BowlingState:
  return BowlingState(
      bowler_y=jnp.asarray(PIN_CY, jnp.float32),
      ball_x=jnp.asarray(-1.0, jnp.float32),
      ball_y=jnp.asarray(PIN_CY, jnp.float32),
      ball_vy=jnp.zeros(()),
      hooked=jnp.zeros((), jnp.bool_),
      pins=jnp.ones((10,), jnp.bool_),
      frame_no=jnp.zeros((), jnp.int32),
      roll_no=jnp.zeros((), jnp.int32),
      pins_this_frame=jnp.zeros((), jnp.int32),
      settle=jnp.zeros((), jnp.int32),
      frame=jnp.zeros((), jnp.int32),
      key=key,
  )


def bowling_step(state: BowlingState, action: jax.Array):
  frame = state.frame + 1
  settling = state.settle > 0
  settle = jnp.maximum(state.settle - 1, 0)
  rolling = state.ball_x >= 0

  up = action == 2
  down = action == 5
  fire = action == 1

  # Aim phase: move the bowler.
  dy = jnp.where(up, -2.0, jnp.where(down, 2.0, 0.0))
  bowler_y = jnp.clip(
      state.bowler_y + jnp.where(rolling | settling, 0.0, dy),
      LANE_TOP + 6, LANE_BOT - 6)

  # Release.
  release = fire & ~rolling & ~settling
  ball_x = jnp.where(release, BOWLER_X + 10.0, state.ball_x)
  ball_y = jnp.where(release, bowler_y, state.ball_y)
  ball_vy = jnp.where(release, 0.0, state.ball_vy)
  hooked = jnp.where(release, False, state.hooked)

  # One hook input while rolling.
  hook = (up | down) & rolling & ~hooked
  ball_vy = jnp.where(hook, jnp.where(up, -HOOK_VY, HOOK_VY), ball_vy)
  hooked = hooked | hook

  # Roll.
  moving = rolling | release
  ball_x = jnp.where(moving, ball_x + BALL_SPEED, ball_x)
  ball_y = jnp.clip(jnp.where(moving, ball_y + ball_vy, ball_y),
                    LANE_TOP + 2, LANE_BOT - 2)

  # Pin hits: standing pins within radius of the ball fall; chain a little
  # sideways (a felled pin fells direct neighbors on a strike-line hit).
  d2 = (jnp.asarray(_PIN_XY[:, 0]) - ball_x) ** 2 \
      + (jnp.asarray(_PIN_XY[:, 1]) - ball_y) ** 2
  hit = state.pins & (d2 <= PIN_RADIUS ** 2) & moving
  pins = state.pins & ~hit
  downed = jnp.sum(hit.astype(jnp.int32))
  reward = downed.astype(jnp.float32)

  # Roll ends past the pins (or in the gutter behind them).
  roll_over = moving & (ball_x > PIN_X0 + 3 * PIN_DX + 10)
  pins_this_frame = state.pins_this_frame + downed
  strike = roll_over & (state.roll_no == 0) & (pins_this_frame >= 10)
  frame_done = roll_over & ((state.roll_no == 1) | strike)
  spare = frame_done & ~strike & (pins_this_frame >= 10)
  reward += jnp.where(strike, STRIKE_BONUS,
                      jnp.where(spare, SPARE_BONUS, 0.0))

  ball_x = jnp.where(roll_over, -1.0, ball_x)
  settle = jnp.where(roll_over, SETTLE_FRAMES, settle)
  roll_no = jnp.where(frame_done, 0,
                      jnp.where(roll_over, state.roll_no + 1, state.roll_no))
  frame_no = jnp.where(frame_done, state.frame_no + 1, state.frame_no)
  pins = jnp.where(frame_done, jnp.ones_like(pins), pins)
  pins_this_frame = jnp.where(frame_done, 0, pins_this_frame)

  done = frame_no >= NUM_FRAMES
  new_state = BowlingState(bowler_y, ball_x, ball_y, ball_vy, hooked, pins,
                           frame_no, roll_no, pins_this_frame, settle,
                           frame, state.key)
  return new_state, reward, done, jnp.zeros((), jnp.bool_)


def bowling_render(state: BowlingState) -> jax.Array:
  bg = (40, 30, 20)
  lane = render.rect_mask(LANE_TOP, LANE_BOT, 12, 156)
  bowler = render.rect_mask(state.bowler_y - 8, state.bowler_y + 8,
                            BOWLER_X - 6, BOWLER_X + 6)
  ball = render.rect_mask(state.ball_y - 3, state.ball_y + 3,
                          state.ball_x - 3, state.ball_x + 3) & \
      (state.ball_x >= 0)
  pins_mask = jnp.zeros((210, 160), jnp.bool_)
  for i, (px, py) in enumerate(_PIN_POS):
    m = render.rect_mask(py - 4, py + 4, px - 2, px + 2) & state.pins[i]
    pins_mask = pins_mask | m
  score_bar = render.rect_mask(20, 26, 12, 12 + 14 * state.frame_no)
  return render.compose(
      bg,
      (lane, (150, 120, 80)),
      (pins_mask, (240, 240, 240)),
      (ball, (30, 30, 30)),
      (bowler, (200, 80, 60)),
      (score_bar, (240, 240, 240)),
  )


GAME = register_game(Game(
    name="bowling",
    num_actions=6,
    init=bowling_init,
    step=bowling_step,
    render=bowling_render,
))
