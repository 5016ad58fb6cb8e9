"""Ms. Pac-Man: eat the maze's pellets while dodging four chasing ghosts.

ALE-compatible surface: 9 actions (NOOP + 8 directions — the cartridge's
minimal set, gym_atari.py:37-61 registers `MsPacmanNoFrameskip-v4`),
210×160×3 frames, +10 per pellet, +50 per power pellet, +200/400/800/1600
per ghost eaten under one power pellet, 3 lives (life-loss signaled for the
reference's end-of-life-as-end-of-episode convention), level refills when
cleared. Random play scores a few hundred points (pellets near the start;
ALE random anchor 307.3) and the human anchor is 6951.6
(atari_data.py:42-102): sustained scoring needs deliberate corridor
coverage and power-pellet ghost hunts.

Dynamics are cell-quantized on a 21×19 maze grid (one move per 2 raw
frames; frightened ghosts every 3), which keeps every step a fixed-shape
gather/argmin over the four neighbor cells — fully vectorizable under vmap
with no data-dependent control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

_MAZE = (
    "WWWWWWWWWWWWWWWWWWW",
    "W........W........W",
    "WoWW.WWW.W.WWW.WWoW",
    "W.................W",
    "W.WW.W.WWWWW.W.WW.W",
    "W....W...W...W....W",
    "WWWW.WWW.W.WWW.WWWW",
    "WWWW.W       W.WWWW",
    "WWWW.W WW WW W.WWWW",  # gap at col 9: the ghost-house door
    "    .  WGGGW  .    ",
    "WWWW.W WWWWW W.WWWW",
    "WWWW.W       W.WWWW",
    "WWWW.W WWWWW W.WWWW",
    "W........W........W",
    "W.WW.WWW.W.WWW.WW.W",
    "Wo.W.....P.....W.oW",
    "WW.W.W.WWWWW.W.W.WW",
    "W....W...W...W....W",
    "W.WWWWWW.W.WWWWWW.W",
    "W.................W",
    "WWWWWWWWWWWWWWWWWWW",
)

ROWS, COLS = len(_MAZE), len(_MAZE[0])  # 21 x 19
CELL = 8  # pixels per cell
Y0, X0 = 22, 4  # frame offset of the maze
TUNNEL_ROW = 9
PLAYER_MOVE_PERIOD = 2  # raw frames per cell move
GHOST_MOVE_PERIOD = 2
FRIGHT_MOVE_PERIOD = 3  # frightened ghosts are slower
POWER_FRAMES = 360
LIVES = 3
EPISODE_FRAMES = 20000
PELLET_POINTS = 10.0
POWER_POINTS = 50.0
GHOST_POINTS = 200.0  # doubles per ghost within one power window
NUM_GHOSTS = 4
GHOST_COLORS = ((200, 72, 72), (198, 89, 179), (84, 184, 153), (180, 122, 48))
# Direction vectors: up, right, down, left; 4 = stopped.
_DR = np.asarray([-1, 0, 1, 0, 0], np.int32)
_DC = np.asarray([0, 1, 0, -1, 0], np.int32)

_WALL = np.asarray([[ch == "W" for ch in row] for row in _MAZE], bool)
_PELLET0 = np.asarray([[ch == "." for ch in row] for row in _MAZE], bool)
_POWER0 = np.asarray([[ch == "o" for ch in row] for row in _MAZE], bool)
_GHOST_START = [(r, c) for r, row in enumerate(_MAZE)
                for c, ch in enumerate(row) if ch == "G"]
while len(_GHOST_START) < NUM_GHOSTS:
  _GHOST_START.append(_GHOST_START[-1])
_PLAYER_START = [(r, c) for r, row in enumerate(_MAZE)
                 for c, ch in enumerate(row) if ch == "P"][0]


class MsPacmanState(NamedTuple):
  pr: jax.Array  # i32, player cell row
  pc: jax.Array
  pdir: jax.Array  # i32 in [0,4], current heading (4 = stopped)
  want: jax.Array  # i32, last requested direction
  gr: jax.Array  # (NUM_GHOSTS,) i32
  gc: jax.Array
  gdir: jax.Array  # (NUM_GHOSTS,) i32
  pellet: jax.Array  # (ROWS, COLS) bool
  power: jax.Array  # (ROWS, COLS) bool
  fright: jax.Array  # i32, frames of ghost fright remaining
  combo: jax.Array  # i32, ghosts eaten this power window
  lives: jax.Array  # i32
  frame: jax.Array  # i32
  key: jax.Array


def _start_positions():
  gr = jnp.asarray([g[0] for g in _GHOST_START[:NUM_GHOSTS]], jnp.int32)
  gc = jnp.asarray([g[1] for g in _GHOST_START[:NUM_GHOSTS]], jnp.int32)
  return (jnp.asarray(_PLAYER_START[0], jnp.int32),
          jnp.asarray(_PLAYER_START[1], jnp.int32), gr, gc)


def ms_pacman_init(key: jax.Array) -> MsPacmanState:
  pr, pc, gr, gc = _start_positions()
  return MsPacmanState(
      pr=pr, pc=pc,
      pdir=jnp.asarray(4, jnp.int32),
      want=jnp.asarray(4, jnp.int32),
      gr=gr, gc=gc,
      gdir=jnp.zeros((NUM_GHOSTS,), jnp.int32),
      pellet=jnp.asarray(_PELLET0),
      power=jnp.asarray(_POWER0),
      fright=jnp.zeros((), jnp.int32),
      combo=jnp.zeros((), jnp.int32),
      lives=jnp.asarray(LIVES, jnp.int32),
      frame=jnp.zeros((), jnp.int32),
      key=key,
  )


def _open(r, c):
  """True if cell (r, c) is corridor; columns wrap through the tunnel row."""
  c = jnp.mod(c, COLS)
  return ~jnp.asarray(_WALL)[r, c]


def _decode(action):
  """9-action decode → preferred (primary, secondary) direction indices.

  NOOP keeps the current request. Diagonals request the horizontal
  component first with the vertical as fallback (arcade joystick feel).
  """
  #           NOOP UP RIGHT LEFT DOWN  UR    UL    DR    DL
  primary = jnp.asarray([4, 0, 1, 3, 2, 1, 3, 1, 3], jnp.int32)[action]
  secondary = jnp.asarray([4, 0, 1, 3, 2, 0, 0, 2, 2], jnp.int32)[action]
  return primary, secondary


def ms_pacman_step(state: MsPacmanState, action: jax.Array):
  dr = jnp.asarray(_DR)
  dc = jnp.asarray(_DC)
  primary, secondary = _decode(action)
  want = jnp.where(primary == 4, state.want, primary)

  move_now = (state.frame % PLAYER_MOVE_PERIOD) == 0

  # Try requested direction (primary then diagonal fallback), else keep
  # heading, else stop.
  def try_dir(d):
    return _open(state.pr + dr[d], state.pc + dc[d]) & (d != 4)

  pick = jnp.where(try_dir(want), want,
                   jnp.where((primary != 4) & try_dir(secondary), secondary,
                             jnp.where(try_dir(state.pdir), state.pdir, 4)))
  pdir = jnp.where(move_now, pick, state.pdir)
  pr = jnp.where(move_now, state.pr + dr[pdir], state.pr)
  pc = jnp.mod(jnp.where(move_now, state.pc + dc[pdir], state.pc), COLS)

  # Eat pellets.
  ate_pellet = state.pellet[pr, pc]
  ate_power = state.power[pr, pc]
  pellet = state.pellet.at[pr, pc].set(False)
  power = state.power.at[pr, pc].set(False)
  reward = (ate_pellet * PELLET_POINTS + ate_power * POWER_POINTS)
  fright = jnp.where(ate_power, POWER_FRAMES,
                     jnp.maximum(state.fright - 1, 0))
  combo = jnp.where(ate_power, 0, state.combo)

  # Ghosts: at their move tick, pick among open non-reverse directions the
  # one that minimizes (chasing) or maximizes (frightened) the Manhattan
  # distance to the player; 25% of picks are uniform-random (scatter).
  frightened = fright > 0
  g_period = jnp.where(frightened, FRIGHT_MOVE_PERIOD, GHOST_MOVE_PERIOD)
  # Ghosts move on the opposite phase from the player: exactly one side
  # moves per frame, so cell-swap pass-throughs cannot happen.
  g_move = (state.frame % g_period) == 1
  key, k1, k2 = jax.random.split(state.key, 3)

  cand_r = state.gr[:, None] + dr[None, :4]  # (G, 4)
  cand_c = jnp.mod(state.gc[:, None] + dc[None, :4], COLS)
  openc = ~jnp.asarray(_WALL)[cand_r, cand_c]
  reverse = jnp.asarray([2, 3, 0, 1], jnp.int32)[
      jnp.clip(state.gdir, 0, 3)][:, None] == jnp.arange(4)[None, :]
  allowed = openc & (~reverse | (openc.sum(-1, keepdims=True) == 1))
  # Tunnel-row wrap distance on columns.
  dcol = jnp.abs(cand_c - pc)
  dcol = jnp.minimum(dcol, COLS - dcol)
  dist = jnp.abs(cand_r - pr) + dcol
  score = jnp.where(frightened, -dist, dist)
  noise = jax.random.uniform(k1, score.shape) * 0.5
  rand_pick = jax.random.uniform(k2, (NUM_GHOSTS, 1)) < 0.25
  score = jnp.where(rand_pick, jax.random.uniform(k1, score.shape) * 10,
                    score + noise)
  score = jnp.where(allowed, score, jnp.inf)
  gdir_new = jnp.argmin(score, axis=-1).astype(jnp.int32)
  gdir = jnp.where(g_move, gdir_new, state.gdir)
  gr = jnp.where(g_move, state.gr + dr[gdir], state.gr)
  gc = jnp.mod(jnp.where(g_move, state.gc + dc[gdir], state.gc), COLS)

  # Contacts: same cell, or swapped cells this tick (passing through).
  same = (gr == pr) & (gc == pc)
  swapped = (gr == state.pr) & (gc == state.pc) & (state.gr == pr) & \
      (state.gc == pc)
  contact = same | swapped

  # Frightened contact: eat the ghost (doubling points), send it home.
  eat = contact & frightened
  n_eaten = eat.sum().astype(jnp.int32)
  # 200 * 2^combo for each, with combo advancing per ghost eaten this tick.
  gains = GHOST_POINTS * (2.0 ** (combo + jnp.cumsum(eat) - 1)) * eat
  reward = reward + gains.sum()
  combo = combo + n_eaten
  home_r, home_c = _GHOST_START[0]
  gr = jnp.where(eat, home_r, gr)
  gc = jnp.where(eat, home_c, gc)

  # Unfrightened contact: lose a life, everyone back to start.
  died = (contact & ~frightened).any()
  lives = state.lives - died.astype(jnp.int32)
  pr0, pc0, gr0, gc0 = _start_positions()
  pr = jnp.where(died, pr0, pr)
  pc = jnp.where(died, pc0, pc)
  gr = jnp.where(died, gr0, gr)
  gc = jnp.where(died, gc0, gc)
  pdir = jnp.where(died, 4, pdir)
  fright = jnp.where(died, 0, fright)

  # Level clear: refill the maze, keep score momentum.
  cleared = ~(pellet.any() | power.any())
  pellet = jnp.where(cleared, jnp.asarray(_PELLET0), pellet)
  power = jnp.where(cleared, jnp.asarray(_POWER0), power)

  frame = state.frame + 1
  done = (lives <= 0) | (frame >= EPISODE_FRAMES)
  life_lost = died & (lives > 0)

  new_state = MsPacmanState(pr, pc, pdir, want, gr, gc, gdir, pellet, power,
                            fright, combo, lives, frame, key)
  return new_state, reward, done, life_lost


def ms_pacman_render(state: MsPacmanState) -> jax.Array:
  # Cell-resolution color grid, upsampled 8x into the frame.
  wall = jnp.asarray(_WALL)
  grid = jnp.where(wall[..., None], jnp.asarray((33, 33, 222), jnp.uint8),
                   jnp.asarray((0, 0, 0), jnp.uint8))
  grid = jnp.where(state.pellet[..., None],
                   jnp.asarray((110, 110, 110), jnp.uint8), grid)
  grid = jnp.where(state.power[..., None],
                   jnp.asarray((228, 180, 180), jnp.uint8), grid)
  frightened = state.fright > 0
  for g in range(NUM_GHOSTS):
    color = jnp.where(frightened,
                      jnp.asarray((66, 114, 194), jnp.uint8),
                      jnp.asarray(GHOST_COLORS[g], jnp.uint8))
    grid = grid.at[state.gr[g], state.gc[g]].set(color)
  grid = grid.at[state.pr, state.pc].set(
      jnp.asarray((252, 224, 112), jnp.uint8))
  big = jnp.repeat(jnp.repeat(grid, CELL, axis=0), CELL, axis=1)
  frame = jnp.zeros((210, 160, 3), jnp.uint8)
  frame = jax.lax.dynamic_update_slice(frame, big, (Y0, X0, 0))
  # Lives indicator.
  lives_bar = render.rect_mask(200, 206, 8, 8 + 10 * state.lives)
  return jnp.where(lives_bar[..., None],
                   jnp.asarray((252, 224, 112), jnp.uint8), frame)


GAME = register_game(Game(
    name="ms_pacman",
    num_actions=9,
    init=ms_pacman_init,
    step=ms_pacman_step,
    render=ms_pacman_render,
    lives=lambda state: state.lives,
))
