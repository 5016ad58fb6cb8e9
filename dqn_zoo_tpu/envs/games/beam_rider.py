"""Beam Rider: lane-locked ship, enemy saucers streaming down 5 beams.

ALE-compatible surface (ref gym_atari.py:37-61; minimal action set 9:
NOOP, FIRE, UP, RIGHT, LEFT, UPRIGHT, UPLEFT, RIGHTFIRE, LEFTFIRE — UP
launches one of 3 torpedoes per sector, the cartridge's limited super
weapon). The ship hops between 5 discrete beams; white saucers descend
the beams and must be shot (44 pts) — 15 kills clear the sector and the
next speeds up. Saucer contact costs a life (3 lives, life-loss signal).
Torpedoes destroy anything on the ship's beam instantly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

BEAMS = 5
BEAM_XS = (24.0, 52.0, 80.0, 108.0, 136.0)  # beam center columns
NUM_SAUCERS = 3
SAUCER_W, SAUCER_H = 12, 6
TOP_Y, SHIP_Y = 48.0, 180.0
SHIP_W, SHIP_H = 14, 8
SHOT_W, SHOT_SPEED = 2, 6.0
SAUCER_SPEED = 1.1
SPAWN_PROB = 0.025
LIVES = 3
HIT_PAUSE = 35
HOP_COOLDOWN = 8  # frames between beam hops (lane-locked movement)
SAUCER_POINTS = 44.0
KILLS_PER_SECTOR = 15
TORPEDOES_PER_SECTOR = 3
TORPEDO_POINTS = 80.0  # torpedoed saucer pays more (cartridge bonus ships)


class BeamRiderState(NamedTuple):
  ship_beam: jax.Array  # i32 in [0, BEAMS)
  hop_cd: jax.Array  # i32
  saucer_beam: jax.Array  # (N,) i32
  saucer_y: jax.Array  # (N,) f32
  saucer_live: jax.Array  # (N,) bool
  shot_y: jax.Array  # f32
  shot_beam: jax.Array  # i32
  shot_live: jax.Array  # bool
  torpedoes: jax.Array  # i32 remaining this sector
  lives: jax.Array  # i32
  sector: jax.Array  # i32
  kills: jax.Array  # i32 kills this sector
  hit_pause: jax.Array  # i32
  key: jax.Array


def beam_rider_init(key: jax.Array) -> BeamRiderState:
  key, k1 = jax.random.split(key)
  return BeamRiderState(
      ship_beam=jax.random.randint(k1, (), 0, BEAMS),
      hop_cd=jnp.zeros((), jnp.int32),
      saucer_beam=jnp.zeros((NUM_SAUCERS,), jnp.int32),
      saucer_y=jnp.zeros((NUM_SAUCERS,), jnp.float32),
      saucer_live=jnp.zeros((NUM_SAUCERS,), jnp.bool_),
      shot_y=jnp.zeros((), jnp.float32),
      shot_beam=jnp.zeros((), jnp.int32),
      shot_live=jnp.zeros((), jnp.bool_),
      torpedoes=jnp.asarray(TORPEDOES_PER_SECTOR, jnp.int32),
      lives=jnp.asarray(LIVES, jnp.int32),
      sector=jnp.zeros((), jnp.int32),
      kills=jnp.zeros((), jnp.int32),
      hit_pause=jnp.zeros((), jnp.int32),
      key=key,
  )


def beam_rider_step(state: BeamRiderState, action: jax.Array):
  right = (action == 3) | (action == 5) | (action == 7)
  left = (action == 4) | (action == 6) | (action == 8)
  fire = (action == 1) | (action == 7) | (action == 8)
  torpedo = (action == 2) | (action == 5) | (action == 6)

  can_hop = state.hop_cd <= 0
  hop_cd = jnp.maximum(state.hop_cd - 1, 0)
  d = right.astype(jnp.int32) - left.astype(jnp.int32)
  ship_beam = jnp.clip(state.ship_beam + jnp.where(can_hop, d, 0),
                       0, BEAMS - 1)
  hopped = ship_beam != state.ship_beam
  hop_cd = jnp.where(hopped, HOP_COOLDOWN, hop_cd)

  # Saucers stream down; spawn on random beams.
  key, k_spawn, k_beam = jax.random.split(state.key, 3)
  speed = SAUCER_SPEED + 0.25 * state.sector.astype(jnp.float32)
  saucer_y = state.saucer_y + jnp.where(state.saucer_live, speed, 0.0)
  spawn = (~state.saucer_live
           & (jax.random.uniform(k_spawn, (NUM_SAUCERS,)) < SPAWN_PROB))
  saucer_beam = jnp.where(
      spawn, jax.random.randint(k_beam, (NUM_SAUCERS,), 0, BEAMS),
      state.saucer_beam)
  saucer_y = jnp.where(spawn, TOP_Y, saucer_y)
  saucer_live = state.saucer_live | spawn
  # A saucer that reaches the bottom leaves (no penalty, like drifting off).
  saucer_live = saucer_live & (saucer_y < 200.0)

  # Laser shot: one in flight, travels up the beam it was fired on.
  do_fire = fire & ~state.shot_live
  shot_beam = jnp.where(do_fire, ship_beam, state.shot_beam)
  shot_y = jnp.where(do_fire, SHIP_Y - 2.0, state.shot_y)
  shot_live = state.shot_live | do_fire
  shot_y = shot_y - jnp.where(shot_live, SHOT_SPEED, 0.0)
  shot_live = shot_live & (shot_y > TOP_Y - 4.0)

  hit = (shot_live & saucer_live & (saucer_beam == shot_beam)
         & (shot_y <= saucer_y + SAUCER_H) & (shot_y + 6.0 >= saucer_y))
  any_hit = hit.any()
  low_idx = NUM_SAUCERS - 1 - jnp.argmax(hit[::-1])
  kill = hit & (jnp.arange(NUM_SAUCERS) == low_idx) & any_hit
  shot_live = shot_live & ~any_hit
  reward = jnp.where(any_hit, SAUCER_POINTS, 0.0)

  # Torpedo: instantly clears every saucer on the ship's beam.
  do_torp = torpedo & (state.torpedoes > 0)
  torp_kill = do_torp & saucer_live & (saucer_beam == ship_beam)
  torpedoes = state.torpedoes - do_torp.astype(jnp.int32)
  reward = reward + TORPEDO_POINTS * jnp.sum(torp_kill)
  killed = kill | torp_kill
  saucer_live = saucer_live & ~killed
  kills = state.kills + jnp.sum(killed).astype(jnp.int32)

  # Saucer reaches the ship's row on its beam: collision.
  vulnerable = state.hit_pause <= 0
  hit_pause = jnp.maximum(state.hit_pause - 1, 0)
  contact = (saucer_live & (saucer_beam == ship_beam)
             & (saucer_y + SAUCER_H >= SHIP_Y))
  crashed = contact.any() & vulnerable
  saucer_live = saucer_live & ~contact
  lives = state.lives - crashed.astype(jnp.int32)
  hit_pause = jnp.where(crashed, HIT_PAUSE, hit_pause)

  # Sector clear: speed up, fresh torpedoes.
  next_sector = kills >= KILLS_PER_SECTOR
  sector = state.sector + next_sector.astype(jnp.int32)
  kills = jnp.where(next_sector, 0, kills)
  torpedoes = jnp.where(next_sector, TORPEDOES_PER_SECTOR, torpedoes)

  done = lives <= 0
  new_state = BeamRiderState(
      ship_beam, hop_cd, saucer_beam, saucer_y, saucer_live, shot_y,
      shot_beam, shot_live, torpedoes, lives, sector, kills, hit_pause, key)
  life_lost = crashed & ~done
  return new_state, reward, done, life_lost


def beam_rider_render(state: BeamRiderState) -> jax.Array:
  import numpy as np
  bg = (0, 0, 12)
  beams = jnp.zeros((210, 160), jnp.bool_)
  for x in BEAM_XS:
    beams = beams | render.rect_mask(TOP_Y, 196, x - 1, x + 1)
  saucers = jnp.zeros((210, 160), jnp.bool_)
  bx = jnp.asarray(np.asarray(BEAM_XS, np.float32))
  for i in range(NUM_SAUCERS):
    x = bx[state.saucer_beam[i]]
    s = render.rect_mask(state.saucer_y[i], state.saucer_y[i] + SAUCER_H,
                         x - SAUCER_W / 2, x + SAUCER_W / 2)
    saucers = saucers | (s & jnp.broadcast_to(state.saucer_live[i],
                                              (210, 160)))
  sx = bx[state.shot_beam]
  shot = render.rect_mask(state.shot_y, state.shot_y + 6,
                          sx - SHOT_W / 2, sx + SHOT_W / 2)
  shipx = bx[state.ship_beam]
  ship = render.rect_mask(SHIP_Y, SHIP_Y + SHIP_H,
                          shipx - SHIP_W / 2, shipx + SHIP_W / 2)
  # Torpedo count pips (visible state, top-left).
  pips = jnp.zeros((210, 160), jnp.bool_)
  for i in range(TORPEDOES_PER_SECTOR):
    p = render.rect_mask(36, 42, 8 + i * 8, 13 + i * 8)
    pips = pips | (p & jnp.broadcast_to(state.torpedoes > i, (210, 160)))
  return render.compose(
      bg,
      (beams, (48, 60, 110)),
      (saucers, (220, 220, 220)),
      (shot & jnp.broadcast_to(state.shot_live, (210, 160)),
       (250, 250, 120)),
      (ship, (90, 186, 220)),
      (pips, (250, 160, 60)),
  )


GAME = register_game(Game(
    name="beam_rider",
    num_actions=9,
    init=beam_rider_init,
    step=beam_rider_step,
    render=beam_rider_render,
    lives=lambda state: state.lives,
))
