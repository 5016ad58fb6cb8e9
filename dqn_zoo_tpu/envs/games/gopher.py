"""Gopher: guard three carrots from a tunnelling gopher.

ALE-compatible surface: 8 actions (NOOP, FIRE, UP, RIGHT, LEFT, UPFIRE,
RIGHTFIRE, LEFTFIRE — the cartridge's minimal set, gym_atari.py:37-61
registers `GopherNoFrameskip-v4`), 210×160×3 frames. The gopher digs
holes along the ground line working toward one of three carrots; the
farmer walks left/right and FIREs the shovel to fill the adjacent hole
(+20) or bonk the gopher when it pops up (+80). A carrot reached by the
gopher is eaten; all three gone ends the episode. Random play fills
plenty of holes by accident — ALE random anchor 257.7 — and the human
anchor is 2412.5 (atari_data.py:42-102): sustained scoring is repeated
bonks while keeping every carrot.

Dynamics are fixed-shape: a (16,) hole-depth array along the ground, one
gopher (cell + phase), 3 carrot flags — where/one-hot logic throughout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

CELLS = 16
CELL_W = 10.0
X0 = 0.0
GROUND_Y = 150.0
FARMER_Y = 120.0
FARMER_SPEED = 2.2
DIG_EVERY = 26  # frames per gopher dig tick
HOLE_DEPTH = 3  # digs to open a hole fully
FILL_POINTS = 20.0
BONK_POINTS = 80.0
POP_EVERY = 160  # the gopher surfaces periodically
POP_FRAMES = 40
CARROT_CELLS = (3, 8, 13)
EPISODE_FRAMES = 20000

_FIRE = (1, 5, 6, 7)
_LEFT = (4, 7)
_RIGHT = (3, 6)


class GopherState(NamedTuple):
  fx: jax.Array  # f32 farmer center x
  holes: jax.Array  # (CELLS,) i32 dig depth, >= HOLE_DEPTH = open
  gcell: jax.Array  # i32 gopher cell
  popped: jax.Array  # i32 frames of pop-up remaining (0 = underground)
  carrots: jax.Array  # (3,) bool
  frame: jax.Array
  key: jax.Array


def gopher_init(key: jax.Array) -> GopherState:
  return GopherState(
      fx=jnp.asarray(80.0, jnp.float32),
      holes=jnp.zeros((CELLS,), jnp.int32),
      gcell=jnp.asarray(0, jnp.int32),
      popped=jnp.zeros((), jnp.int32),
      carrots=jnp.ones((3,), jnp.bool_),
      frame=jnp.zeros((), jnp.int32),
      key=key,
  )


def _cell_x(c):
  return X0 + (c + 0.5) * CELL_W


def gopher_step(state: GopherState, action: jax.Array):
  key, k_move, k_pop = jax.random.split(state.key, 3)
  frame = state.frame + 1
  fire = jnp.isin(action, jnp.asarray(_FIRE))
  left = jnp.isin(action, jnp.asarray(_LEFT))
  right = jnp.isin(action, jnp.asarray(_RIGHT))
  fx = jnp.clip(state.fx + jnp.where(left, -FARMER_SPEED,
                                     jnp.where(right, FARMER_SPEED, 0.0)),
                CELL_W / 2, CELLS * CELL_W - CELL_W / 2)
  fcell = jnp.clip((fx / CELL_W).astype(jnp.int32), 0, CELLS - 1)

  reward = jnp.zeros(())
  # Shovel: fill the farmer's cell (or bonk a popped gopher there).
  popped = state.popped > 0
  bonk = fire & popped & (state.gcell == fcell)
  reward += jnp.where(bonk, BONK_POINTS, 0.0)
  fill = fire & ~bonk & (state.holes[fcell] > 0)
  reward += jnp.where(fill, FILL_POINTS, 0.0)
  holes = state.holes.at[fcell].set(
      jnp.where(fill, 0, state.holes[fcell]))

  # Bonked gopher restarts from an edge, underground.
  gcell = jnp.where(bonk, jnp.where(jax.random.bernoulli(k_move), 0,
                                    CELLS - 1), state.gcell)
  pop_timer = jnp.where(bonk, 0, state.popped)

  # Gopher: digs toward the nearest remaining carrot.
  carrot_cells = jnp.asarray(CARROT_CELLS)
  dist = jnp.abs(carrot_cells - gcell) + jnp.where(state.carrots, 0, 999)
  target = carrot_cells[jnp.argmin(dist)]
  tick = (frame % DIG_EVERY == 0) & ~bonk
  step_dir = jnp.sign(target - gcell)
  at_target = step_dir == 0
  gcell = jnp.clip(jnp.where(tick & ~at_target, gcell + step_dir, gcell),
                   0, CELLS - 1)
  holes = holes.at[gcell].set(
      jnp.where(tick, jnp.minimum(holes[gcell] + 1, HOLE_DEPTH),
                holes[gcell]))

  # Carrot eaten: the gopher sits at its cell with a fully open hole.
  eaten = (carrot_cells == gcell) & (holes[gcell] >= HOLE_DEPTH) & \
      state.carrots & tick & at_target
  carrots = state.carrots & ~eaten
  # After eating, head for the next carrot from a random edge.
  any_eaten = eaten.any()
  gcell = jnp.where(any_eaten,
                    jnp.where(jax.random.bernoulli(k_move), 0, CELLS - 1),
                    gcell)

  # Pop-up schedule.
  pop_now = (frame % POP_EVERY == 0) & ~bonk
  pop_timer = jnp.where(pop_now, POP_FRAMES,
                        jnp.maximum(pop_timer - 1, 0))

  done = (~carrots.any()) | (frame >= EPISODE_FRAMES)
  new_state = GopherState(fx, holes, gcell, pop_timer, carrots, frame, key)
  return new_state, reward, done, jnp.zeros((), jnp.bool_)


def gopher_render(state: GopherState) -> jax.Array:
  bg = (110, 160, 210)  # sky
  ground = render.rect_mask(int(GROUND_Y), 210, 0, 160)
  holes_mask = jnp.zeros((210, 160), jnp.bool_)
  for c in range(CELLS):
    x = _cell_x(c)
    depth = jnp.clip(state.holes[c], 0, HOLE_DEPTH)
    m = render.rect_mask(GROUND_Y, GROUND_Y + 6.0 * depth, x - 4, x + 4) & \
        (state.holes[c] > 0)
    holes_mask = holes_mask | m
  carrots_mask = jnp.zeros((210, 160), jnp.bool_)
  for i, c in enumerate(CARROT_CELLS):
    x = _cell_x(c)
    m = render.rect_mask(GROUND_Y - 14, GROUND_Y, x - 3, x + 3) & \
        state.carrots[i]
    carrots_mask = carrots_mask | m
  gx = _cell_x(state.gcell.astype(jnp.float32))
  gopher = render.rect_mask(
      jnp.where(state.popped > 0, GROUND_Y - 12.0, GROUND_Y + 20.0),
      jnp.where(state.popped > 0, GROUND_Y, GROUND_Y + 30.0),
      gx - 5, gx + 5)
  farmer = render.rect_mask(FARMER_Y, GROUND_Y, state.fx - 5, state.fx + 5)
  return render.compose(
      bg,
      (ground, (150, 110, 60)),
      (holes_mask, (70, 45, 25)),
      (carrots_mask, (230, 130, 40)),
      (gopher, (120, 90, 140)),
      (farmer, (240, 240, 240)),
  )


GAME = register_game(Game(
    name="gopher",
    num_actions=8,
    init=gopher_init,
    step=gopher_step,
    render=gopher_render,
))
