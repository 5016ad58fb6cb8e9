"""Q*bert: hop around a cube pyramid, coloring every cube, dodging chasers.

ALE-compatible surface: 6 actions (NOOP, FIRE, UP, RIGHT, LEFT, DOWN — the
cartridge's minimal set, gym_atari.py:37-61 registers `QbertNoFrameskip-v4`;
the four directions map to the four diagonal hops), 210×160×3 frames,
+25 per newly-colored cube, +1000 screen-completion bonus (the board then
recolors), 4 lives. Hopping off the pyramid's edge or touching Coily / the
red ball costs a life. Random play colors a handful of cubes before hopping
off the edge (ALE random anchor 163.9) and the human anchor is 13455.0
(atari_data.py:42-102): sustained scoring means clearing successive boards
while baiting Coily off the edge.

Dynamics are cube-grid quantized — the pyramid is a (7,7) lower-triangular
bool grid, the player/chasers move one cube per fixed period — so every
step is fixed-shape gather/where logic, fully vectorizable under vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

N = 7  # pyramid rows; row r has r+1 cubes → 28 cubes
HOP_PERIOD = 16  # raw frames per player hop
COILY_PERIOD = 20  # frames per Coily hop (slightly slower than the player)
BALL_PERIOD = 18
BALL_SPAWN_EVERY = 280  # frames between red-ball spawns
COILY_HATCH_FRAMES = 140  # Coily appears after this many frames
CUBE_POINTS = 25.0
ROUND_BONUS = 1000.0
LIVES = 4
EPISODE_FRAMES = 20000
DEATH_FREEZE = 30  # frames frozen after a death before play resumes

# Screen layout of cube (r, c): isometric pyramid, apex top-center.
CUBE_W, CUBE_H = 22, 11
ROW_DY = 24


def _cube_x(r, c):
  return 80.0 + (2.0 * c - r) * (CUBE_W / 2.0) - CUBE_W / 2.0


def _cube_y(r):
  return 38.0 + r * ROW_DY


class QbertState(NamedTuple):
  pr: jax.Array  # i32 player cube row
  pc: jax.Array  # i32 player cube col (0..pr)
  colored: jax.Array  # (N, N) bool, lower-triangular meaningful
  cr: jax.Array  # i32 Coily row (-1 = not hatched)
  cc: jax.Array
  br: jax.Array  # i32 red ball row (-1 = inactive)
  bc: jax.Array
  lives: jax.Array  # i32
  freeze: jax.Array  # i32, death-freeze frames remaining
  frame: jax.Array  # i32
  key: jax.Array


def qbert_init(key: jax.Array) -> QbertState:
  return QbertState(
      pr=jnp.asarray(0, jnp.int32), pc=jnp.asarray(0, jnp.int32),
      colored=jnp.zeros((N, N), jnp.bool_),
      cr=jnp.asarray(-1, jnp.int32), cc=jnp.asarray(0, jnp.int32),
      br=jnp.asarray(-1, jnp.int32), bc=jnp.asarray(0, jnp.int32),
      lives=jnp.asarray(LIVES, jnp.int32),
      freeze=jnp.zeros((), jnp.int32),
      frame=jnp.zeros((), jnp.int32),
      key=key,
  )


def _valid(r, c):
  return (r >= 0) & (r < N) & (c >= 0) & (c <= r)


def qbert_step(state: QbertState, action: jax.Array):
  key, k_ball, k_coily = jax.random.split(state.key, 3)
  frame = state.frame + 1
  frozen = state.freeze > 0
  freeze = jnp.maximum(state.freeze - 1, 0)
  reward = jnp.zeros((), jnp.float32)

  # Landing at spawn colors the apex (the cartridge scores the cube Q*bert
  # spawns onto): first frame of the episode, and after each respawn the
  # apex is re-scored if a board refresh uncolored it.
  at_spawn_color = (frame == 1) & ~state.colored[0, 0]
  reward += jnp.where(at_spawn_color, CUBE_POINTS, 0.0)
  state = state._replace(colored=state.colored.at[0, 0].set(
      state.colored[0, 0] | (frame == 1)))

  # --- player hop (every HOP_PERIOD frames; joystick → diagonal):
  # UP(2)=up-right (r-1,c), RIGHT(3)=down-right (r+1,c+1),
  # LEFT(4)=up-left (r-1,c-1), DOWN(5)=down-left (r+1,c).
  dr = jnp.asarray([0, 0, -1, 1, -1, 1], jnp.int32)[action]
  dc = jnp.asarray([0, 0, 0, 1, -1, 0], jnp.int32)[action]
  moving = (dr != 0) & (frame % HOP_PERIOD == 0) & ~frozen
  tr = state.pr + dr
  tc = state.pc + dc
  on_board = _valid(tr, tc)
  fell = moving & ~on_board
  hop = moving & on_board
  pr = jnp.where(hop, tr, state.pr)
  pc = jnp.where(hop, tc, state.pc)

  newly = hop & ~state.colored[jnp.clip(pr, 0, N - 1),
                               jnp.clip(pc, 0, N - 1)]
  colored = state.colored.at[jnp.clip(pr, 0, N - 1),
                             jnp.clip(pc, 0, N - 1)].set(
      state.colored[jnp.clip(pr, 0, N - 1), jnp.clip(pc, 0, N - 1)] | hop)
  reward += jnp.where(newly, CUBE_POINTS, 0.0)

  # Round complete: all 28 valid cubes colored → bonus + fresh board.
  tri = jnp.tril(jnp.ones((N, N), jnp.bool_))
  complete = jnp.all(colored | ~tri)
  reward += jnp.where(complete, ROUND_BONUS, 0.0)
  colored = jnp.where(complete, jnp.zeros_like(colored), colored)

  # --- red ball: spawns at a random apex-adjacent cube, bounces down.
  ball_active = state.br >= 0
  spawn_ball = (~ball_active) & (frame % BALL_SPAWN_EVERY == 0) & ~frozen
  b_side = jax.random.bernoulli(k_ball)
  br = jnp.where(spawn_ball, 1, state.br)
  bc = jnp.where(spawn_ball, b_side.astype(jnp.int32), state.bc)
  ball_hops = (br >= 0) & (frame % BALL_PERIOD == 0) & ~frozen & ~spawn_ball
  b_side2 = jax.random.bernoulli(jax.random.fold_in(k_ball, 1))
  br2 = br + 1
  bc2 = bc + b_side2.astype(jnp.int32)
  br = jnp.where(ball_hops, br2, br)
  bc = jnp.where(ball_hops, bc2, bc)
  off = br >= N  # rolled off the bottom
  br = jnp.where(off, -1, br)

  # --- Coily: hatches after COILY_HATCH_FRAMES, then greedily chases.
  hatch = (state.cr < 0) & (frame > COILY_HATCH_FRAMES) & ~frozen
  cr = jnp.where(hatch, 0, state.cr)
  cc = jnp.where(hatch, 0, state.cc)
  coily_hops = (cr >= 0) & (frame % COILY_PERIOD == 0) & ~frozen & ~hatch
  # Four diagonal candidates; pick the valid one minimizing distance to
  # the player (small random tiebreak).
  cand_r = cr + jnp.asarray([-1, -1, 1, 1], jnp.int32)
  cand_c = cc + jnp.asarray([-1, 0, 0, 1], jnp.int32)
  ok = _valid(cand_r, cand_c)
  dist = (jnp.abs(cand_r - pr) + jnp.abs(cand_c - pc)).astype(jnp.float32)
  dist += jax.random.uniform(k_coily, (4,), maxval=0.3)
  dist = jnp.where(ok, dist, 1e9)
  pick = jnp.argmin(dist)
  cr = jnp.where(coily_hops, cand_r[pick], cr)
  cc = jnp.where(coily_hops, cand_c[pick], cc)

  # --- deaths: fall off, Coily contact, ball contact.
  caught = (cr == pr) & (cc == pc) & (cr >= 0) & ~frozen
  balled = (br == pr) & (bc == pc) & (br >= 0) & ~frozen
  died = fell | caught | balled
  lives = state.lives - died.astype(jnp.int32)
  done = (lives <= 0) | (frame >= EPISODE_FRAMES)
  # Death reset: player to apex, chasers despawn, colors kept; the respawn
  # landing scores the apex if a board refresh left it uncolored.
  pr = jnp.where(died, 0, pr)
  pc = jnp.where(died, 0, pc)
  cr = jnp.where(died, -1, cr)
  br = jnp.where(died, -1, br)
  freeze = jnp.where(died, DEATH_FREEZE, freeze)
  respawn = died & ~done
  reward += jnp.where(respawn & ~colored[0, 0], CUBE_POINTS, 0.0)
  colored = colored.at[0, 0].set(colored[0, 0] | respawn)

  new_state = QbertState(pr, pc, colored, cr, cc, br, bc, lives, freeze,
                         frame, key)
  life_lost = died & ~done
  return new_state, reward, done, life_lost


# Host-precomputed cube geometry for rendering.
_CUBE_XS = np.asarray([[_cube_x(r, c) for c in range(N)] for r in range(N)],
                      np.float32)
_CUBE_YS = np.asarray([_cube_y(r) for r in range(N)], np.float32)
_TRI = np.tril(np.ones((N, N), bool))


def qbert_render(state: QbertState) -> jax.Array:
  bg = (20, 20, 60)
  layers = []
  for r in range(N):
    for c in range(r + 1):
      x, y = float(_CUBE_XS[r, c]), float(_CUBE_YS[r])
      top = render.rect_mask(y, y + CUBE_H, x, x + CUBE_W)
      face = render.rect_mask(y + CUBE_H, y + CUBE_H + 8, x + 3,
                              x + CUBE_W - 3)
      is_col = state.colored[r, c]
      top_rgb = jnp.where(is_col, jnp.asarray((210, 182, 66), jnp.uint8),
                          jnp.asarray((66, 110, 210), jnp.uint8))
      layers.append((top, top_rgb))
      layers.append((face, (120, 80, 140)))

  def blob(r, c, w, h, dy):
    x = jnp.sum(jnp.where(
        (jnp.arange(N)[:, None] == r) & (jnp.arange(N)[None, :] == c),
        jnp.asarray(_CUBE_XS), 0.0)) + CUBE_W / 2 - w / 2
    y = jnp.sum(jnp.where(jnp.arange(N) == r, jnp.asarray(_CUBE_YS), 0.0)) \
        + dy
    return render.rect_mask(y, y + h, x, x + w)

  player = blob(state.pr, state.pc, 8, 10, -10.0)
  coily = blob(jnp.maximum(state.cr, 0), state.cc, 8, 12, -12.0) & \
      (state.cr >= 0)
  ball = blob(jnp.maximum(state.br, 0), state.bc, 6, 6, -6.0) & \
      (state.br >= 0)
  lives_bar = render.rect_mask(200, 206, 8, 8 + 10 * state.lives)

  frame = jnp.broadcast_to(jnp.asarray(bg, jnp.uint8), (210, 160, 3))
  for mask, rgb in layers:
    color = rgb if isinstance(rgb, jax.Array) else jnp.asarray(rgb, jnp.uint8)
    frame = jnp.where(mask[..., None], color, frame)
  frame = jnp.where(ball[..., None], jnp.asarray((200, 60, 60), jnp.uint8),
                    frame)
  frame = jnp.where(coily[..., None], jnp.asarray((170, 80, 200), jnp.uint8),
                    frame)
  frame = jnp.where(player[..., None], jnp.asarray((230, 120, 40), jnp.uint8),
                    frame)
  frame = jnp.where(lives_bar[..., None],
                    jnp.asarray((230, 120, 40), jnp.uint8), frame)
  return frame


GAME = register_game(Game(
    name="qbert",
    num_actions=6,
    init=qbert_init,
    step=qbert_step,
    render=qbert_render,
    lives=lambda state: state.lives,
))
