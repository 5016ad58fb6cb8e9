"""Boxing: two boxers trade punches in a ring for a two-minute bout.

ALE-compatible surface: 18 actions (the cartridge uses the full action set,
gym_atari.py:37-61 registers `BoxingNoFrameskip-v4`), 210×160×3 frames,
reward +1 per punch landed and −1 per punch taken, no lives, bout ends after
2 minutes of game time or on a 100-hit KO. Random play nets ≈0 (you take
about as many as you land) and the human anchor is 12.1
(atari_data.py:42-102); this parameterization preserves both: the enemy
tracks and counterpunches, so positive score requires range/timing play
(punish on approach, step out of the enemy's reach window).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

# Ring interior (pixels).
RING_TOP = 45.0
RING_BOTTOM = 178.0
RING_LEFT = 32.0
RING_RIGHT = 124.0
BOXER_W, BOXER_H = 8, 22
PLAYER_SPEED = 2.0
ENEMY_SPEED = 1.4  # slower than the player: range control is learnable
REACH = 14.0  # glove extension beyond the body box
PUNCH_FRAMES = 4  # glove extended this many frames
COOLDOWN = 24  # frames between punches (either boxer)
ALIGN_Y = 14.0  # vertical alignment window for a punch to land
KO_HITS = 100
EPISODE_FRAMES = 7200  # 2 minutes at 60 Hz — the bout clock


class BoxingState(NamedTuple):
  px: jax.Array  # f32, player body left edge
  py: jax.Array
  ex: jax.Array  # enemy
  ey: jax.Array
  p_punch: jax.Array  # i32, frames of extension remaining (0 = retracted)
  e_punch: jax.Array
  p_cool: jax.Array  # i32, frames until next punch allowed
  e_cool: jax.Array
  p_hits: jax.Array  # i32, punches landed by the player
  e_hits: jax.Array
  frame: jax.Array  # i32
  key: jax.Array


def boxing_init(key: jax.Array) -> BoxingState:
  key, k1, k2 = jax.random.split(key, 3)
  y0 = (RING_TOP + RING_BOTTOM) / 2 - BOXER_H / 2
  jitter = jax.random.uniform(k1, (2,), minval=-16.0, maxval=16.0)
  return BoxingState(
      px=jnp.asarray(RING_LEFT + 12.0, jnp.float32),
      py=jnp.asarray(y0, jnp.float32) + jitter[0],
      ex=jnp.asarray(RING_RIGHT - 12.0 - BOXER_W, jnp.float32),
      ey=jnp.asarray(y0, jnp.float32) + jitter[1],
      p_punch=jnp.zeros((), jnp.int32),
      e_punch=jnp.zeros((), jnp.int32),
      p_cool=jnp.zeros((), jnp.int32),
      e_cool=jax.random.randint(k2, (), 0, COOLDOWN),
      p_hits=jnp.zeros((), jnp.int32),
      e_hits=jnp.zeros((), jnp.int32),
      frame=jnp.zeros((), jnp.int32),
      key=key,
  )


def _dirs(action):
  """Full-action-set decode: (dx, dy, fire) — gym_atari.py's 18-action order
  (NOOP FIRE UP RIGHT LEFT DOWN UR UL DR DL UF RF LF DF URF ULF DRF DLF)."""
  up = jnp.isin(action, jnp.asarray([2, 6, 7, 10, 14, 15]))
  down = jnp.isin(action, jnp.asarray([5, 8, 9, 13, 16, 17]))
  right = jnp.isin(action, jnp.asarray([3, 6, 8, 11, 14, 16]))
  left = jnp.isin(action, jnp.asarray([4, 7, 9, 12, 15, 17]))
  fire = (action == 1) | (action >= 10)
  dx = right.astype(jnp.float32) - left.astype(jnp.float32)
  dy = down.astype(jnp.float32) - up.astype(jnp.float32)
  return dx, dy, fire


def boxing_step(state: BoxingState, action: jax.Array):
  dx, dy, fire = _dirs(action)
  px = jnp.clip(state.px + dx * PLAYER_SPEED, RING_LEFT, RING_RIGHT - BOXER_W)
  py = jnp.clip(state.py + dy * PLAYER_SPEED, RING_TOP, RING_BOTTOM - BOXER_H)

  # Enemy AI: close the horizontal gap to just inside its reach, align
  # vertically, and counterpunch whenever aligned and in range.
  gap = px + BOXER_W - state.ex  # player's right edge vs enemy's left edge
  want_x = jnp.where(gap < -REACH + 2.0, -ENEMY_SPEED,
                     jnp.where(gap > -4.0, ENEMY_SPEED, 0.0))
  ydiff = py - state.ey
  want_y = jnp.clip(ydiff, -ENEMY_SPEED, ENEMY_SPEED)
  ex = jnp.clip(state.ex + want_x, RING_LEFT, RING_RIGHT - BOXER_W)
  ey = jnp.clip(state.ey + want_y, RING_TOP, RING_BOTTOM - BOXER_H)

  aligned = jnp.abs(py - ey) <= ALIGN_Y
  dist = ex - (px + BOXER_W)  # horizontal daylight between the bodies

  # Punch starts: player on FIRE, enemy whenever its cooldown allows and the
  # player is inside its reach (plus a small random feint delay).
  key, k1 = jax.random.split(state.key)
  p_start = fire & (state.p_cool <= 0)
  e_wants = aligned & (dist <= REACH) & (state.e_cool <= 0)
  e_start = e_wants & jax.random.bernoulli(k1, 0.25)

  p_punch = jnp.where(p_start, PUNCH_FRAMES, jnp.maximum(state.p_punch - 1, 0))
  e_punch = jnp.where(e_start, PUNCH_FRAMES, jnp.maximum(state.e_punch - 1, 0))
  p_cool = jnp.where(p_start, COOLDOWN, jnp.maximum(state.p_cool - 1, 0))
  e_cool = jnp.where(e_start, COOLDOWN, jnp.maximum(state.e_cool - 1, 0))

  # A punch lands on the frame it starts, if aligned and in reach. Landing
  # knocks the opponent back a step (ALE-style shove), which breaks the
  # enemy's range and is what makes hit-and-step-back play win on points.
  p_lands = p_start & aligned & (dist <= REACH)
  e_lands = e_start & aligned & (dist <= REACH) & ~p_lands  # trade: first in
  ex = jnp.where(p_lands, jnp.clip(ex + 6.0, RING_LEFT,
                                   RING_RIGHT - BOXER_W), ex)
  px = jnp.where(e_lands, jnp.clip(px - 6.0, RING_LEFT,
                                   RING_RIGHT - BOXER_W), px)

  p_hits = state.p_hits + p_lands.astype(jnp.int32)
  e_hits = state.e_hits + e_lands.astype(jnp.int32)
  reward = p_lands.astype(jnp.float32) - e_lands.astype(jnp.float32)

  frame = state.frame + 1
  done = ((frame >= EPISODE_FRAMES) | (p_hits >= KO_HITS)
          | (e_hits >= KO_HITS))

  new_state = BoxingState(px, py, ex, ey, p_punch, e_punch, p_cool, e_cool,
                          p_hits, e_hits, frame, key)
  return new_state, reward, done, jnp.zeros((), jnp.bool_)


def boxing_render(state: BoxingState) -> jax.Array:
  bg = (110, 156, 66)  # apron green
  mat = render.rect_mask(RING_TOP - 6, RING_BOTTOM + 6, RING_LEFT - 8,
                         RING_RIGHT + 8 + BOXER_W)
  ropes = (render.rect_mask(RING_TOP - 6, RING_TOP - 4, RING_LEFT - 8,
                            RING_RIGHT + 8 + BOXER_W)
           | render.rect_mask(RING_BOTTOM + 4, RING_BOTTOM + 6, RING_LEFT - 8,
                              RING_RIGHT + 8 + BOXER_W))
  player = render.rect_mask(state.py, state.py + BOXER_H, state.px,
                            state.px + BOXER_W)
  enemy = render.rect_mask(state.ey, state.ey + BOXER_H, state.ex,
                           state.ex + BOXER_W)
  # Extended gloves (player punches rightward, enemy leftward).
  garm_y0 = state.py + 6
  p_glove = render.rect_mask(garm_y0, garm_y0 + 4, state.px + BOXER_W,
                             state.px + BOXER_W
                             + jnp.where(state.p_punch > 0, REACH, 3.0))
  earm_y0 = state.ey + 6
  e_ext = jnp.where(state.e_punch > 0, REACH, 3.0)
  e_glove = render.rect_mask(earm_y0, earm_y0 + 4, state.ex - e_ext, state.ex)
  # Score tally bars at the top (white left = player, black right = enemy).
  p_bar = render.rect_mask(16, 22, 16, 16 + jnp.minimum(state.p_hits, 64))
  e_bar = render.rect_mask(16, 22, 144 - jnp.minimum(state.e_hits, 64), 144)
  return render.compose(
      bg,
      (mat, (160, 171, 191)),
      (ropes, (214, 214, 214)),
      (p_glove, (236, 236, 236)),
      (e_glove, (52, 52, 52)),
      (player, (252, 252, 252)),
      (enemy, (20, 20, 20)),
      (p_bar, (252, 252, 252)),
      (e_bar, (20, 20, 20)),
  )


GAME = register_game(Game(
    name="boxing",
    num_actions=18,
    init=boxing_init,
    step=boxing_step,
    render=boxing_render,
))
