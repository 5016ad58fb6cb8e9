"""Crazy Climber: scale the skyscraper past closing windows and pots.

ALE-compatible surface (ref gym_atari.py:37-61; minimal action set 9:
NOOP, UP, RIGHT, LEFT, DOWN, UPRIGHT, UPLEFT, DOWNRIGHT, DOWNLEFT — the
cartridge maps the twin joysticks to 9 combined motions, no fire). The
climber moves over a 7-column window grid; a window whose shutter is
CLOSED cannot be climbed through (UP is blocked), and falling flower pots
knock the climber off — 5 lives, life-loss signal. Each row gained pays
100 (the cartridge's step bonus is height-based); topping the building
banks a large bonus and starts the next, faster building. Score is the
dominant dense-reward climbing signal like the cartridge's.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

COLS = 7
ROWS = 24  # building height in window rows
WIN_W, WIN_H = 14, 10  # window cell size in world px
BLDG_LEFT = 26.0
COL_PITCH = 16.0  # horizontal window pitch
ROW_PITCH = 14.0
CLIMBER_W, CLIMBER_H = 10, 12
NUM_POTS = 3
POT_W, POT_H = 4, 4
POT_SPEED = 2.6
POT_PROB = 0.02
LIVES = 5
HIT_PAUSE = 40
MOVE_COOLDOWN = 6  # frames between grid moves (climbing rhythm)
ROW_POINTS = 300.0
TOP_BONUS = 2000.0
SHUT_PERIOD = 180  # window shutter cycle in frames


class CrazyClimberState(NamedTuple):
  col: jax.Array  # i32 grid column
  row: jax.Array  # i32 rows climbed from the bottom (0 = street)
  move_cd: jax.Array  # i32
  shut_phase: jax.Array  # (COLS,) i32 per-column shutter phase offsets
  pot_col: jax.Array  # (NUM_POTS,) i32
  pot_y: jax.Array  # (NUM_POTS,) f32 world y
  pot_live: jax.Array  # (NUM_POTS,) bool
  lives: jax.Array  # i32
  building: jax.Array  # i32 completed buildings
  frame: jax.Array  # i32
  hit_pause: jax.Array  # i32
  key: jax.Array


def crazy_climber_init(key: jax.Array) -> CrazyClimberState:
  key, k1, k2 = jax.random.split(key, 3)
  return CrazyClimberState(
      col=jax.random.randint(k1, (), 0, COLS),
      row=jnp.zeros((), jnp.int32),
      move_cd=jnp.zeros((), jnp.int32),
      shut_phase=jax.random.randint(k2, (COLS,), 0, SHUT_PERIOD),
      pot_col=jnp.zeros((NUM_POTS,), jnp.int32),
      pot_y=jnp.zeros((NUM_POTS,), jnp.float32),
      pot_live=jnp.zeros((NUM_POTS,), jnp.bool_),
      lives=jnp.asarray(LIVES, jnp.int32),
      building=jnp.zeros((), jnp.int32),
      frame=jnp.zeros((), jnp.int32),
      hit_pause=jnp.zeros((), jnp.int32),
      key=key,
  )


def _shutter_closed(state, col, row):
  """A window is closed for the second half of its phase cycle; phase
  advances with the frame clock and varies per column and row."""
  phase = jnp.mod(
      state.frame + state.shut_phase[col] + row * 37, SHUT_PERIOD)
  return phase >= (SHUT_PERIOD * 2) // 3


def crazy_climber_step(state: CrazyClimberState, action: jax.Array):
  up = (action == 1) | (action == 5) | (action == 6)
  right = (action == 2) | (action == 5) | (action == 7)
  left = (action == 3) | (action == 6) | (action == 8)
  down = (action == 4) | (action == 7) | (action == 8)

  can_move = state.move_cd <= 0
  move_cd = jnp.maximum(state.move_cd - 1, 0)
  dc = right.astype(jnp.int32) - left.astype(jnp.int32)
  col = jnp.clip(state.col + jnp.where(can_move, dc, 0), 0, COLS - 1)
  # UP is blocked when the window above is shuttered closed.
  closed_above = _shutter_closed(state, col, state.row + 1)
  dr = (up & ~closed_above).astype(jnp.int32) - down.astype(jnp.int32)
  dr = jnp.where(can_move, dr, 0)
  row = jnp.clip(state.row + dr, 0, ROWS)
  moved = (col != state.col) | (row != state.row)
  move_cd = jnp.where(moved, MOVE_COOLDOWN, move_cd)
  reward = jnp.where(row > state.row, ROW_POINTS, 0.0)

  # Pots fall down random columns; biased toward the climber's.
  key, k_spawn, k_col, k_bias = jax.random.split(state.key, 4)
  spawn = (~state.pot_live
           & (jax.random.uniform(k_spawn, (NUM_POTS,)) < POT_PROB))
  rand_col = jax.random.randint(k_col, (NUM_POTS,), 0, COLS)
  biased = jax.random.uniform(k_bias, (NUM_POTS,)) < 0.5
  new_col = jnp.where(biased, col, rand_col)
  pot_col = jnp.where(spawn, new_col, state.pot_col)
  pot_y = jnp.where(spawn, 0.0, state.pot_y)
  pot_live = state.pot_live | spawn
  speed = POT_SPEED + 0.4 * state.building.astype(jnp.float32)
  pot_y = pot_y + jnp.where(pot_live, speed, 0.0)
  pot_live = pot_live & (pot_y < 210.0)

  # The climber is drawn at a fixed screen row; pots in his column whose
  # screen y reaches him knock him down (unless in post-hit pause).
  climber_y = 150.0  # fixed screen position; the building scrolls
  vulnerable = state.hit_pause <= 0
  hit_pause = jnp.maximum(state.hit_pause - 1, 0)
  pot_hits = (pot_live & (pot_col == col)
              & (pot_y + POT_H >= climber_y)
              & (pot_y <= climber_y + CLIMBER_H))
  knocked = pot_hits.any() & vulnerable
  pot_live = pot_live & ~pot_hits
  lives = state.lives - knocked.astype(jnp.int32)
  hit_pause = jnp.where(knocked, HIT_PAUSE, hit_pause)
  # A knockdown also costs height (fall two rows).
  row = jnp.where(knocked, jnp.maximum(row - 2, 0), row)

  # Topped the building: bonus, next building is faster.
  topped = row >= ROWS
  reward = reward + jnp.where(topped, TOP_BONUS, 0.0)
  building = state.building + topped.astype(jnp.int32)
  row = jnp.where(topped, 0, row)

  frame = state.frame + 1
  done = lives <= 0
  new_state = CrazyClimberState(col, row, move_cd, state.shut_phase,
                                pot_col, pot_y, pot_live, lives, building,
                                frame, hit_pause, key)
  life_lost = knocked & ~done
  return new_state, reward, done, life_lost


def crazy_climber_render(state: CrazyClimberState) -> jax.Array:
  bg = (40, 44, 60)
  bldg_right = BLDG_LEFT + (COLS - 1) * COL_PITCH + WIN_W + 8
  building = render.rect_mask(20, 200, BLDG_LEFT - 8, bldg_right)
  # Windows: 10 visible rows scrolled so the climber's row sits at y=150.
  climber_y = 150.0
  windows_open = jnp.zeros((210, 160), jnp.bool_)
  windows_closed = jnp.zeros((210, 160), jnp.bool_)
  for vis in range(10):
    wrow = state.row + 4 - vis  # world row drawn at this band
    y0 = climber_y - (4 - vis) * ROW_PITCH - WIN_H
    for c in range(COLS):
      x0 = BLDG_LEFT + c * COL_PITCH
      m = render.rect_mask(y0, y0 + WIN_H, x0, x0 + WIN_W)
      valid = (wrow >= 0) & (wrow <= ROWS)
      closed = _shutter_closed(state, jnp.asarray(c), wrow) & valid
      windows_closed = windows_closed | (m & jnp.broadcast_to(
          closed, (210, 160)))
      windows_open = windows_open | (m & jnp.broadcast_to(
          valid & ~closed, (210, 160)))
  pots = jnp.zeros((210, 160), jnp.bool_)
  for i in range(NUM_POTS):
    x0 = BLDG_LEFT + state.pot_col[i].astype(jnp.float32) * COL_PITCH + 5.0
    p = render.rect_mask(state.pot_y[i], state.pot_y[i] + POT_H,
                         x0, x0 + POT_W)
    pots = pots | (p & jnp.broadcast_to(state.pot_live[i], (210, 160)))
  cx = BLDG_LEFT + state.col.astype(jnp.float32) * COL_PITCH + 2.0
  climber = render.rect_mask(climber_y, climber_y + CLIMBER_H,
                             cx, cx + CLIMBER_W)
  return render.compose(
      bg,
      (building, (120, 116, 100)),
      (windows_open, (210, 220, 235)),
      (windows_closed, (70, 66, 56)),
      (pots, (220, 90, 60)),
      (climber, (230, 60, 120)),
  )


GAME = register_game(Game(
    name="crazy_climber",
    num_actions=9,
    init=crazy_climber_init,
    step=crazy_climber_step,
    render=crazy_climber_render,
    lives=lambda state: state.lives,
))
