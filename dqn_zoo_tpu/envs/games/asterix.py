"""Asterix: collect objects crossing eight lanes, dodge the lyres.

ALE-compatible surface: 9 actions (NOOP, UP, RIGHT, LEFT, DOWN, UPRIGHT,
UPLEFT, DOWNRIGHT, DOWNLEFT — ALE's minimal set for Asterix), 210×160×3
frames, +50 per collected object, 3 lives lost by touching a lyre (life-loss
signaling like the real game). Objects traverse their lane horizontally,
alternating direction by lane; speed ramps with the score to reproduce the
cartridge's difficulty ramp. Anchors (atari_data.py): random ≈ 210,
human ≈ 8503 — random play brushes a few objects (50 pts each) per life;
sustained play requires steering onto collectibles while avoiding ~1-in-4
lyres.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

NUM_LANES = 8
LANE_TOP = 30
LANE_H = 18
FIELD_BOTTOM = LANE_TOP + NUM_LANES * LANE_H  # 174
LEFT_WALL, RIGHT_WALL = 12.0, 148.0
PLAYER_W, PLAYER_H = 8, 10
PLAYER_SPEED = 2.0
OBJ_W, OBJ_H = 8, 8
LYRE_PROB = 0.25  # spawn draws a lyre with this probability
BASE_SPEED = 1.0
SPEED_RAMP = 0.0002  # extra px/frame per point scored (caps below)
MAX_SPEED = 3.0
POINTS = 50.0
LIVES = 3
RESPAWN_FRAMES = 45
COLLECT_COLOR = (210, 164, 74)  # cauldron gold
LYRE_COLOR = (184, 50, 50)
PLAYER_COLOR = (236, 236, 236)


class AsterixState(NamedTuple):
  player_x: jax.Array  # f32, left edge
  player_y: jax.Array  # f32, top edge
  obj_x: jax.Array  # (NUM_LANES,) f32
  obj_live: jax.Array  # (NUM_LANES,) bool
  obj_is_lyre: jax.Array  # (NUM_LANES,) bool
  score: jax.Array  # f32 — drives the speed ramp
  lives: jax.Array  # i32
  respawn_delay: jax.Array  # i32 — invulnerability after a lyre hit
  key: jax.Array


def _lane_tops() -> jax.Array:
  return jnp.asarray(
      [LANE_TOP + i * LANE_H + (LANE_H - OBJ_H) // 2
       for i in range(NUM_LANES)], jnp.float32)


def _lane_dirs() -> jax.Array:
  # Alternate travel direction by lane (even lanes →, odd lanes ←).
  return jnp.asarray([1.0 if i % 2 == 0 else -1.0
                      for i in range(NUM_LANES)], jnp.float32)


def asterix_init(key: jax.Array) -> AsterixState:
  key, kx, kl = jax.random.split(key, 3)
  return AsterixState(
      player_x=jnp.asarray(76.0, jnp.float32),
      player_y=jnp.asarray(
          LANE_TOP + (NUM_LANES // 2) * LANE_H + 4.0, jnp.float32),
      obj_x=jax.random.uniform(kx, (NUM_LANES,), minval=LEFT_WALL,
                               maxval=RIGHT_WALL - OBJ_W),
      obj_live=jnp.ones((NUM_LANES,), jnp.bool_),
      obj_is_lyre=jax.random.uniform(kl, (NUM_LANES,)) < LYRE_PROB,
      score=jnp.zeros((), jnp.float32),
      lives=jnp.asarray(LIVES, jnp.int32),
      respawn_delay=jnp.zeros((), jnp.int32),
      key=key,
  )


def asterix_step(state: AsterixState, action: jax.Array):
  # 9-action decode: 0 NOOP, 1 UP, 2 RIGHT, 3 LEFT, 4 DOWN, 5 UPRIGHT,
  # 6 UPLEFT, 7 DOWNRIGHT, 8 DOWNLEFT (ALE minimal-set order).
  up = (action == 1) | (action == 5) | (action == 6)
  down = (action == 4) | (action == 7) | (action == 8)
  right = (action == 2) | (action == 5) | (action == 7)
  left = (action == 3) | (action == 6) | (action == 8)
  dx = jnp.where(right, PLAYER_SPEED, 0.0) - jnp.where(left, PLAYER_SPEED,
                                                       0.0)
  dy = jnp.where(down, PLAYER_SPEED, 0.0) - jnp.where(up, PLAYER_SPEED, 0.0)
  px = jnp.clip(state.player_x + dx, LEFT_WALL, RIGHT_WALL - PLAYER_W)
  py = jnp.clip(state.player_y + dy, float(LANE_TOP),
                float(FIELD_BOTTOM - PLAYER_H))

  # Objects drift along their lane; speed ramps with score.
  speed = jnp.minimum(BASE_SPEED + SPEED_RAMP * state.score, MAX_SPEED)
  ox = state.obj_x + _lane_dirs() * speed
  # Off-field objects die; dead slots respawn at the lane's entry edge with
  # a fresh type draw.
  off = (ox < -float(OBJ_W)) | (ox > 160.0)
  live = state.obj_live & ~off
  key, k_spawn, k_type = jax.random.split(state.key, 3)
  do_spawn = ~live & (jax.random.uniform(k_spawn, (NUM_LANES,)) < 0.03)
  entry = jnp.where(_lane_dirs() > 0, -float(OBJ_W) + 1.0, 159.0)
  ox = jnp.where(do_spawn, entry, ox)
  is_lyre = jnp.where(do_spawn,
                      jax.random.uniform(k_type, (NUM_LANES,)) < LYRE_PROB,
                      state.obj_is_lyre)
  live = live | do_spawn

  # Player↔object overlap per lane.
  lane_y = _lane_tops()
  oy_overlap = (py + PLAYER_H >= lane_y) & (py <= lane_y + OBJ_H)
  ox_overlap = (ox <= px + PLAYER_W) & (ox + OBJ_W >= px)
  touch = live & oy_overlap & ox_overlap

  collected = touch & ~is_lyre
  reward = POINTS * collected.any().astype(jnp.float32)
  vulnerable = state.respawn_delay <= 0
  respawn_delay = jnp.maximum(state.respawn_delay - 1, 0)
  lyre_hit = (touch & is_lyre).any() & vulnerable
  live = live & ~collected
  lives = state.lives - lyre_hit.astype(jnp.int32)
  respawn_delay = jnp.where(lyre_hit, RESPAWN_FRAMES, respawn_delay)
  # A hit clears the field (the cartridge resets the wave).
  live = live & ~lyre_hit
  score = state.score + reward

  done = lives <= 0
  new_state = AsterixState(px, py, ox, live, is_lyre, score, lives,
                           respawn_delay, key)
  life_lost = lyre_hit & ~done
  return new_state, reward, done, life_lost


def asterix_render(state: AsterixState) -> jax.Array:
  bg = (82, 126, 45)  # field green
  border = (render.rect_mask(0, LANE_TOP, 0, 160)
            | render.rect_mask(FIELD_BOTTOM, 210, 0, 160)
            | render.rect_mask(0, 210, 0, int(LEFT_WALL) - 4)
            | render.rect_mask(0, 210, int(RIGHT_WALL) + 4, 160))
  frame = render.compose(bg, (border, (45, 50, 184)))
  lane_y = _lane_tops()
  for i in range(NUM_LANES):
    box = render.rect_mask(lane_y[i], lane_y[i] + OBJ_H,
                           state.obj_x[i], state.obj_x[i] + OBJ_W)
    box = box & jnp.broadcast_to(state.obj_live[i], (210, 160))
    color = jnp.where(state.obj_is_lyre[i],
                      jnp.asarray(LYRE_COLOR, jnp.uint8),
                      jnp.asarray(COLLECT_COLOR, jnp.uint8))
    frame = jnp.where(box[..., None], color, frame)
  player = render.rect_mask(state.player_y, state.player_y + PLAYER_H,
                            state.player_x, state.player_x + PLAYER_W)
  return jnp.where(player[..., None],
                   jnp.asarray(PLAYER_COLOR, jnp.uint8), frame)


GAME = register_game(Game(
    name="asterix",
    num_actions=9,
    init=asterix_init,
    step=asterix_step,
    render=asterix_render,
    lives=lambda state: state.lives,
))
