"""Space Invaders: marching alien grid, cannon, bombs, 3 lives.

ALE-compatible surface: 6 actions (NOOP, FIRE, RIGHT, LEFT, RIGHTFIRE,
LEFTFIRE), 210×160×3 frames, per-alien rewards scored by row (5..30 like
ALE), 3 lives with life-loss signaling (exercises the ZeroDiscountOnLifeLoss
path, processors.py:274-293). The wave respawns lower and faster when
cleared; the game ends when the aliens reach the cannon row or lives run out.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

ROWS, COLS = 6, 6
ALIEN_W, ALIEN_H = 8, 8
SPACING_X, SPACING_Y = 16, 14
GRID_W = (COLS - 1) * SPACING_X + ALIEN_W  # 88 px
GRID_H = (ROWS - 1) * SPACING_Y + ALIEN_H  # 78 px
LEFT_WALL, RIGHT_WALL = 8.0, 152.0
START_X, START_Y = 26.0, 52.0
PLAYER_Y = 185
PLAYER_W, PLAYER_H = 8, 8
PLAYER_SPEED = 2.0
SHOT_W, SHOT_SPEED = 2, 6.0
NUM_BOMBS = 3
BOMB_W, BOMB_H, BOMB_SPEED = 2, 6, 2.5
BOMB_PROB = 0.02  # per-slot per-frame spawn probability
LIVES = 3
RESPAWN_FRAMES = 30
ROW_POINTS = (30.0, 25.0, 20.0, 15.0, 10.0, 5.0)  # top row first


class SpaceInvadersState(NamedTuple):
  player_x: jax.Array  # f32, left edge
  aliens: jax.Array  # (ROWS, COLS) bool
  grid_x: jax.Array  # f32, block left edge
  grid_y: jax.Array  # f32, block top edge
  direction: jax.Array  # f32, ±1 march direction
  shot_x: jax.Array  # f32
  shot_y: jax.Array  # f32
  shot_live: jax.Array  # bool
  bomb_x: jax.Array  # (NUM_BOMBS,) f32
  bomb_y: jax.Array  # (NUM_BOMBS,) f32
  bomb_live: jax.Array  # (NUM_BOMBS,) bool
  lives: jax.Array  # i32
  wave: jax.Array  # i32 — completed waves (speeds up the march)
  respawn_delay: jax.Array  # i32 — invulnerability frames after a hit
  key: jax.Array


def space_invaders_init(key: jax.Array) -> SpaceInvadersState:
  key, k1 = jax.random.split(key)
  return SpaceInvadersState(
      player_x=jax.random.uniform(k1, (), minval=LEFT_WALL,
                                  maxval=RIGHT_WALL - PLAYER_W),
      aliens=jnp.ones((ROWS, COLS), jnp.bool_),
      grid_x=jnp.asarray(START_X, jnp.float32),
      grid_y=jnp.asarray(START_Y, jnp.float32),
      direction=jnp.asarray(1.0, jnp.float32),
      shot_x=jnp.zeros((), jnp.float32),
      shot_y=jnp.zeros((), jnp.float32),
      shot_live=jnp.zeros((), jnp.bool_),
      bomb_x=jnp.zeros((NUM_BOMBS,), jnp.float32),
      bomb_y=jnp.zeros((NUM_BOMBS,), jnp.float32),
      bomb_live=jnp.zeros((NUM_BOMBS,), jnp.bool_),
      lives=jnp.asarray(LIVES, jnp.int32),
      wave=jnp.zeros((), jnp.int32),
      respawn_delay=jnp.zeros((), jnp.int32),
      key=key,
  )


def space_invaders_step(state: SpaceInvadersState, action: jax.Array):
  right = (action == 2) | (action == 4)
  left = (action == 3) | (action == 5)
  fire = (action == 1) | (action == 4) | (action == 5)
  dx = jnp.where(right, PLAYER_SPEED, jnp.where(left, -PLAYER_SPEED, 0.0))
  player_x = jnp.clip(state.player_x + dx, LEFT_WALL, RIGHT_WALL - PLAYER_W)

  # Alien march: horizontal drift, descend + flip at the walls; speed grows
  # as the wave thins and across waves (classic difficulty ramp).
  alive_frac = state.aliens.mean(dtype=jnp.float32)
  speed = (0.25 + 0.9 * (1.0 - alive_frac)
           + 0.1 * state.wave.astype(jnp.float32))
  gx = state.grid_x + state.direction * speed
  # Only columns that still have aliens bound the block against the walls.
  col_alive = state.aliens.any(axis=0)  # (COLS,)
  col_idx = jnp.arange(COLS, dtype=jnp.float32)
  lo_col = jnp.min(jnp.where(col_alive, col_idx, COLS - 1.0))
  hi_col = jnp.max(jnp.where(col_alive, col_idx, 0.0))
  block_left = gx + lo_col * SPACING_X
  block_right = gx + hi_col * SPACING_X + ALIEN_W
  at_edge = (block_left < LEFT_WALL) | (block_right > RIGHT_WALL)
  direction = jnp.where(at_edge, -state.direction, state.direction)
  gy = state.grid_y + jnp.where(at_edge, 8.0, 0.0)
  gx = jnp.where(at_edge, state.grid_x, gx)

  # Player shot: one on screen at a time (ALE contract).
  do_fire = fire & ~state.shot_live
  shot_x = jnp.where(do_fire, player_x + PLAYER_W / 2, state.shot_x)
  shot_y = jnp.where(do_fire, float(PLAYER_Y) - 2.0, state.shot_y)
  shot_live = state.shot_live | do_fire
  shot_y = shot_y - jnp.where(shot_live, SHOT_SPEED, 0.0)
  shot_live = shot_live & (shot_y > 34.0)

  # Shot↔alien collision: map the shot into the (row, col) grid.
  rel_x = shot_x - gx
  rel_y = shot_y - gy
  col = jnp.floor(rel_x / SPACING_X).astype(jnp.int32)
  row = jnp.floor(rel_y / SPACING_Y).astype(jnp.int32)
  in_cell_x = (rel_x - col.astype(jnp.float32) * SPACING_X) < (ALIEN_W +
                                                               SHOT_W)
  in_cell_y = (rel_y - row.astype(jnp.float32) * SPACING_Y) < ALIEN_H
  in_grid = ((row >= 0) & (row < ROWS) & (col >= 0) & (col < COLS)
             & in_cell_x & in_cell_y & shot_live)
  rc = jnp.clip(row, 0, ROWS - 1)
  cc = jnp.clip(col, 0, COLS - 1)
  hit = in_grid & state.aliens[rc, cc]
  aliens = state.aliens.at[rc, cc].set(
      jnp.where(hit, False, state.aliens[rc, cc]))
  shot_live = shot_live & ~hit
  reward = jnp.where(hit, jnp.asarray(ROW_POINTS, jnp.float32)[rc], 0.0)

  # Bombs: idle slots spawn from the lowest live alien of a random column.
  key, k_col, k_spawn = jax.random.split(state.key, 3)
  spawn_col = jax.random.randint(k_col, (NUM_BOMBS,), 0, COLS)
  col_has = aliens[:, spawn_col].any(axis=0)  # (NUM_BOMBS,)
  row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, NUM_BOMBS), 0)
  lowest = jnp.max(jnp.where(aliens[:, spawn_col], row_ids, -1), axis=0)
  do_spawn = (~state.bomb_live & col_has
              & (jax.random.uniform(k_spawn, (NUM_BOMBS,)) < BOMB_PROB))
  bomb_x = jnp.where(
      do_spawn,
      gx + spawn_col.astype(jnp.float32) * SPACING_X + ALIEN_W / 2,
      state.bomb_x)
  bomb_y = jnp.where(
      do_spawn,
      gy + (lowest.astype(jnp.float32) + 1.0) * SPACING_Y,
      state.bomb_y)
  bomb_live = state.bomb_live | do_spawn
  bomb_y = bomb_y + jnp.where(bomb_live, BOMB_SPEED, 0.0)
  bomb_live = bomb_live & (bomb_y < 200.0)

  # Bomb↔player collision (skipped during post-hit invulnerability).
  vulnerable = state.respawn_delay <= 0
  respawn_delay = jnp.maximum(state.respawn_delay - 1, 0)
  overlap = (bomb_live
             & (bomb_x + BOMB_W >= player_x)
             & (bomb_x <= player_x + PLAYER_W)
             & (bomb_y + BOMB_H >= PLAYER_Y)
             & (bomb_y <= PLAYER_Y + PLAYER_H))
  player_hit = overlap.any() & vulnerable
  bomb_live = bomb_live & ~player_hit  # all bombs clear on a hit
  lives = state.lives - player_hit.astype(jnp.int32)
  respawn_delay = jnp.where(player_hit, RESPAWN_FRAMES, respawn_delay)

  # Wave cleared → respawn lower and faster.
  cleared = ~aliens.any()
  aliens = jnp.where(cleared, jnp.ones_like(aliens), aliens)
  wave = state.wave + cleared.astype(jnp.int32)
  gy = jnp.where(cleared, jnp.minimum(START_Y + 8.0 * wave.astype(
      jnp.float32), 90.0), gy)
  gx = jnp.where(cleared, START_X, gx)

  # Terminal: aliens reach the cannon row, or out of lives.
  row_alive = aliens.any(axis=1)
  row_idxf = jnp.arange(ROWS, dtype=jnp.float32)
  low_row = jnp.max(jnp.where(row_alive, row_idxf, 0.0))
  invaded = gy + low_row * SPACING_Y + ALIEN_H >= PLAYER_Y
  done = (lives <= 0) | invaded

  new_state = SpaceInvadersState(
      player_x, aliens, gx, gy, direction, shot_x, shot_y, shot_live,
      bomb_x, bomb_y, bomb_live, lives, wave, respawn_delay, key)
  life_lost = player_hit & ~done
  return new_state, reward, done, life_lost


def space_invaders_render(state: SpaceInvadersState) -> jax.Array:
  bg = (0, 0, 0)
  ground = render.rect_mask(195, 197, 0, 160)
  # Alien mask: a pixel is an alien if its (row, col) cell is alive and it
  # falls inside the ALIEN_W×ALIEN_H box of that cell.
  rows_px = jax.lax.broadcasted_iota(jnp.int32, (210, 160), 0)
  cols_px = jax.lax.broadcasted_iota(jnp.int32, (210, 160), 1)
  rel_y = rows_px.astype(jnp.float32) - state.grid_y
  rel_x = cols_px.astype(jnp.float32) - state.grid_x
  cell_r = jnp.floor(rel_y / SPACING_Y).astype(jnp.int32)
  cell_c = jnp.floor(rel_x / SPACING_X).astype(jnp.int32)
  in_box = ((rel_y - cell_r.astype(jnp.float32) * SPACING_Y < ALIEN_H)
            & (rel_x - cell_c.astype(jnp.float32) * SPACING_X < ALIEN_W)
            & (cell_r >= 0) & (cell_r < ROWS)
            & (cell_c >= 0) & (cell_c < COLS))
  alive = state.aliens[jnp.clip(cell_r, 0, ROWS - 1),
                       jnp.clip(cell_c, 0, COLS - 1)]
  alien_mask = in_box & alive & (rel_y >= 0) & (rel_x >= 0)

  player = render.rect_mask(PLAYER_Y, PLAYER_Y + PLAYER_H,
                            state.player_x, state.player_x + PLAYER_W)
  shot = render.rect_mask(state.shot_y, state.shot_y + 6,
                          state.shot_x, state.shot_x + SHOT_W)
  shot = shot & jnp.broadcast_to(state.shot_live, (210, 160))
  bombs = jnp.zeros((210, 160), jnp.bool_)
  for i in range(NUM_BOMBS):
    b = render.rect_mask(state.bomb_y[i], state.bomb_y[i] + BOMB_H,
                         state.bomb_x[i], state.bomb_x[i] + BOMB_W)
    bombs = bombs | (b & jnp.broadcast_to(state.bomb_live[i], (210, 160)))

  return render.compose(
      bg,
      (ground, (142, 142, 142)),
      (alien_mask, (134, 134, 29)),
      (bombs, (236, 140, 30)),
      (shot & jnp.broadcast_to(state.shot_live, (210, 160)),
       (236, 236, 236)),
      (player, (50, 132, 50)),
  )


GAME = register_game(Game(
    name="space_invaders",
    num_actions=6,
    init=space_invaders_init,
    step=space_invaders_step,
    render=space_invaders_render,
    lives=lambda state: state.lives,
))
