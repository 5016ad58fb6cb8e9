"""Fishing Derby: out-fish a relentless opponent before he reaches 99.

ALE-compatible surface: 18 actions (the full joystick set — the cartridge's
minimal set IS the full 18, gym_atari.py:37-61 registers
`FishingDerbyNoFrameskip-v4`), 210×160×3 frames. Reward is the SIGNED
score delta: +value when you land a fish (2..6 by depth), −value when the
opponent lands one; first side to 99 ends the episode. The opponent is a
scripted competent angler, so idle/random play loses steadily — ALE random
anchor −91.7, human −38.7 (atari_data.py:42-102): even experts merely lose
more slowly than the machine opponent wins.

Dynamics are fixed-shape: 6 fish lanes swimming horizontally, one player
hook (position + hooked-lane index), a shark patrolling the surface that
steals hooked fish, and an opponent modeled as a fixed-rate catcher —
all where/clip logic, fully vectorizable under vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

WATER_TOP = 84.0
NUM_LANES = 6
LANE_DY = 18.0
LANE_VALUES = (2.0, 2.0, 4.0, 4.0, 6.0, 6.0)  # deeper = worth more
FISH_W, FISH_H = 12, 6
HOOK_X_MIN, HOOK_X_MAX = 20.0, 72.0  # player's half of the pond
HOOK_SPEED = 2.0
REEL_SPEED = 2.5
SHARK_Y = 70.0
SHARK_SPEED = 1.6
SHARK_W = 18
OPP_CATCH_EVERY = 110  # frames per opponent point-capture event
OPP_VALUE = 4.0  # opponent average catch value
TARGET = 99.0
EPISODE_FRAMES = 12000

_UP = (2, 6, 7, 10, 14, 15)
_DOWN = (5, 8, 9, 13, 16, 17)
_LEFT = (4, 7, 9, 12, 15, 17)
_RIGHT = (3, 6, 8, 11, 14, 16)


def _lane_y(i):
  return WATER_TOP + 14.0 + i * LANE_DY


class FishingDerbyState(NamedTuple):
  hook_x: jax.Array  # f32
  hook_y: jax.Array  # f32
  hooked_lane: jax.Array  # i32, -1 = nothing on the line
  fish_x: jax.Array  # (6,) f32
  fish_dir: jax.Array  # (6,) f32 (+1/-1)
  shark_x: jax.Array  # f32
  shark_dir: jax.Array  # f32
  my_score: jax.Array  # f32
  opp_score: jax.Array  # f32
  frame: jax.Array  # i32
  key: jax.Array


def fishing_derby_init(key: jax.Array) -> FishingDerbyState:
  key, kf, kd = jax.random.split(key, 3)
  return FishingDerbyState(
      hook_x=jnp.asarray(46.0, jnp.float32),
      hook_y=jnp.asarray(WATER_TOP + 10.0, jnp.float32),
      hooked_lane=jnp.asarray(-1, jnp.int32),
      fish_x=jax.random.uniform(kf, (NUM_LANES,), minval=10.0, maxval=150.0),
      fish_dir=jnp.where(jax.random.bernoulli(kd, shape=(NUM_LANES,)),
                         1.0, -1.0),
      shark_x=jnp.asarray(80.0, jnp.float32),
      shark_dir=jnp.asarray(1.0, jnp.float32),
      my_score=jnp.zeros(()),
      opp_score=jnp.zeros(()),
      frame=jnp.zeros((), jnp.int32),
      key=key,
  )


def fishing_derby_step(state: FishingDerbyState, action: jax.Array):
  key = state.key
  frame = state.frame + 1
  up = jnp.isin(action, jnp.asarray(_UP))
  down = jnp.isin(action, jnp.asarray(_DOWN))
  left = jnp.isin(action, jnp.asarray(_LEFT))
  right = jnp.isin(action, jnp.asarray(_RIGHT))

  # Fish swim; wrap at the pond edges.
  fish_x = state.fish_x + state.fish_dir * (0.8 + 0.1 * jnp.arange(NUM_LANES))
  fish_dir = jnp.where((fish_x < 6.0) | (fish_x > 154.0),
                       -state.fish_dir, state.fish_dir)
  fish_x = jnp.clip(fish_x, 6.0, 154.0)

  # Shark patrols the surface.
  shark_x = state.shark_x + state.shark_dir * SHARK_SPEED
  shark_dir = jnp.where((shark_x < 10.0) | (shark_x > 140.0),
                        -state.shark_dir, state.shark_dir)
  shark_x = jnp.clip(shark_x, 10.0, 140.0)

  reeling = state.hooked_lane >= 0
  # Free hook: steer. Hooked: the line rises ONLY while UP is held (the
  # cartridge's active reel); otherwise it sinks back and the fish can
  # shake off — this is what makes random play lose at the ALE anchor's
  # rate (−91.7): wandering inputs hook fish but rarely land them.
  dx = jnp.where(left, -HOOK_SPEED, 0.0) + jnp.where(right, HOOK_SPEED, 0.0)
  dy = jnp.where(up, -HOOK_SPEED, 0.0) + jnp.where(down, HOOK_SPEED, 0.0)
  hook_x = jnp.clip(state.hook_x + dx, HOOK_X_MIN, HOOK_X_MAX)
  hook_y = jnp.where(
      reeling,
      jnp.clip(state.hook_y + jnp.where(up, -REEL_SPEED, 1.2),
               WATER_TOP + 4.0, _lane_y(NUM_LANES - 1) + 6.0),
      jnp.clip(state.hook_y + dy, WATER_TOP + 4.0,
               _lane_y(NUM_LANES - 1) + 6.0))
  # Fish fight the line: without the reel engaged they escape.
  key, k_esc = jax.random.split(key)
  escaped = reeling & ~up & jax.random.bernoulli(k_esc, 0.05)

  # Bite: free hook overlapping a fish in its lane.
  lane_ys = jnp.asarray([_lane_y(i) for i in range(NUM_LANES)])
  overlap = (jnp.abs(fish_x - hook_x) < FISH_W / 2 + 2) & \
      (jnp.abs(lane_ys - hook_y) < FISH_H / 2 + 3)
  bite = (~reeling) & overlap.any()
  bit_lane = jnp.argmax(overlap)
  hooked_lane = jnp.where(bite, bit_lane.astype(jnp.int32),
                          state.hooked_lane)

  # Hooked fish rides the line.
  fish_x = jnp.where(
      (jnp.arange(NUM_LANES) == hooked_lane) & (hooked_lane >= 0),
      hook_x, fish_x)

  # Landing: the line reaches the surface with a fish on.
  landed = (hooked_lane >= 0) & (hook_y <= WATER_TOP + 4.0)
  # Shark steal: crossing the shark's mouth band near the surface.
  stolen = (hooked_lane >= 0) & (hook_y <= SHARK_Y + 8.0) & \
      (jnp.abs(shark_x + SHARK_W / 2 - hook_x) < SHARK_W / 2 + 2) & ~landed
  value = jnp.asarray(LANE_VALUES)[jnp.clip(hooked_lane, 0, NUM_LANES - 1)]
  reward = jnp.where(landed, value, 0.0)
  my_score = state.my_score + jnp.where(landed, value, 0.0)
  # Fish respawns at a random edge after landing/steal.
  key, kr = jax.random.split(key)
  respawn_x = jnp.where(jax.random.bernoulli(kr), 10.0, 150.0)
  fish_x = jnp.where(
      (jnp.arange(NUM_LANES) == hooked_lane) & (landed | stolen),
      respawn_x, fish_x)
  hooked_lane = jnp.where(landed | stolen | escaped, -1, hooked_lane)
  hook_y = jnp.where(landed | stolen, WATER_TOP + 10.0, hook_y)

  # Opponent: a competent scripted angler scores steadily.
  opp_scores = (frame % OPP_CATCH_EVERY) == 0
  reward = reward - jnp.where(opp_scores, OPP_VALUE, 0.0)
  opp_score = state.opp_score + jnp.where(opp_scores, OPP_VALUE, 0.0)

  done = (my_score >= TARGET) | (opp_score >= TARGET) | \
      (frame >= EPISODE_FRAMES)
  new_state = FishingDerbyState(hook_x, hook_y, hooked_lane, fish_x,
                                fish_dir, shark_x, shark_dir, my_score,
                                opp_score, frame, key)
  return new_state, reward, done, jnp.zeros((), jnp.bool_)


def fishing_derby_render(state: FishingDerbyState) -> jax.Array:
  bg = (120, 170, 220)  # sky
  water = render.rect_mask(int(WATER_TOP), 210, 0, 160)
  pier_l = render.rect_mask(60, int(WATER_TOP), 8, 36)
  pier_r = render.rect_mask(60, int(WATER_TOP), 124, 152)
  line = render.rect_mask(int(WATER_TOP) - 10, state.hook_y + 2,
                          state.hook_x - 1, state.hook_x + 1)
  hook = render.rect_mask(state.hook_y - 2, state.hook_y + 3,
                          state.hook_x - 2, state.hook_x + 3)
  fish_mask = jnp.zeros((210, 160), jnp.bool_)
  for i in range(NUM_LANES):
    y = _lane_y(i)
    m = render.rect_mask(y - FISH_H / 2, y + FISH_H / 2,
                         state.fish_x[i] - FISH_W / 2,
                         state.fish_x[i] + FISH_W / 2)
    fish_mask = fish_mask | m
  shark = render.rect_mask(SHARK_Y, SHARK_Y + 10, state.shark_x,
                           state.shark_x + SHARK_W)
  my_bar = render.rect_mask(20, 26, 8, 8 + state.my_score)
  opp_bar = render.rect_mask(30, 36, 8, 8 + state.opp_score)
  return render.compose(
      bg,
      (water, (40, 80, 160)),
      (pier_l, (150, 110, 70)),
      (pier_r, (150, 110, 70)),
      (fish_mask, (220, 220, 120)),
      (shark, (90, 90, 100)),
      (line, (230, 230, 230)),
      (hook, (250, 250, 250)),
      (my_bar, (240, 240, 240)),
      (opp_bar, (240, 160, 60)),
  )


GAME = register_game(Game(
    name="fishing_derby",
    num_actions=18,
    init=fishing_derby_init,
    step=fishing_derby_step,
    render=fishing_derby_render,
))
