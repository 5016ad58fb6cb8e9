"""Atlantis: fixed gun emplacements defend the city from Gorgon ships.

ALE-compatible surface: 4 actions (NOOP, FIRE, RIGHTFIRE, LEFTFIRE — ALE's
minimal set: center, right and left gun), 210×160×3 frames. Ships cross the
sky at four altitudes with per-altitude speeds; each completed pass drops
the ship one altitude band, and a ship crossing the lowest band fires its
death ray and destroys one of six city installations — all six gone ends
the game (no lives). Guns are hitscan along fixed lines (center: vertical;
side guns: 45° diagonals), matching the cartridge's projectile geometry in
the limit. Destroyed ships score by altitude (100/200/300/400 low→high
scaled down: ALE awards 100..~3000; we use 100·(band+1)). Anchors
(atari_data.py): random ≈ 12850, human ≈ 29028 — random play mashes FIRE
across three guns and downs many slow low ships.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

NUM_BANDS = 4
BAND_TOP = 40
BAND_H = 18
SHIP_W, SHIP_H = 12, 6
BAND_SPEEDS = (0.8, 1.2, 1.7, 2.3)  # px/frame, lowest band first
NUM_CITY = 6
CITY_Y = 180
CITY_W, CITY_H = 14, 14
CITY_XS = tuple(14 + i * 24 for i in range(NUM_CITY))  # left edges
CENTER_GUN_X = 80.0
SIDE_L_X, SIDE_R_X = 20.0, 140.0
GUN_Y = 176.0
FIRE_COOLDOWN = 8  # frames between shots per gun
SPAWN_PROB = 0.04
BEAM_HALF_W = 5.0  # hitscan tolerance


class AtlantisState(NamedTuple):
  ship_x: jax.Array  # (NUM_BANDS,) f32 — left edge
  ship_live: jax.Array  # (NUM_BANDS,) bool
  ship_dir: jax.Array  # (NUM_BANDS,) f32 ±1
  ship_band: jax.Array  # (NUM_BANDS,) i32 — current altitude band (0 lowest)
  city_live: jax.Array  # (NUM_CITY,) bool
  cooldown: jax.Array  # (3,) i32 — per-gun frames until ready (L, C, R)
  flash: jax.Array  # (3,) i32 — beam render frames remaining
  key: jax.Array


def _band_y(band: jax.Array) -> jax.Array:
  """Band index (0 = lowest) → ship top y."""
  return (BAND_TOP + (NUM_BANDS - 1 - band).astype(jnp.float32) * BAND_H
          + (BAND_H - SHIP_H) / 2.0)


def atlantis_init(key: jax.Array) -> AtlantisState:
  key, kd = jax.random.split(key)
  dirs = jnp.where(jax.random.bernoulli(kd, 0.5, (NUM_BANDS,)), 1.0, -1.0)
  return AtlantisState(
      ship_x=jnp.zeros((NUM_BANDS,), jnp.float32),
      ship_live=jnp.zeros((NUM_BANDS,), jnp.bool_),
      ship_dir=dirs,
      ship_band=jnp.arange(NUM_BANDS, dtype=jnp.int32),
      city_live=jnp.ones((NUM_CITY,), jnp.bool_),
      cooldown=jnp.zeros((3,), jnp.int32),
      flash=jnp.zeros((3,), jnp.int32),
      key=key,
  )


def _beam_hit(gun: int, ship_cx: jax.Array, ship_cy: jax.Array) -> jax.Array:
  """Does gun's beam line pass through the ship center (±BEAM_HALF_W)?

  Center gun: x = CENTER_GUN_X. Left gun: 45° up-right from (SIDE_L_X,
  GUN_Y): x - SIDE_L_X = GUN_Y - y. Right gun: 45° up-left.
  """
  if gun == 1:
    return jnp.abs(ship_cx - CENTER_GUN_X) <= BEAM_HALF_W + SHIP_W / 2
  if gun == 0:
    beam_x = SIDE_L_X + (GUN_Y - ship_cy)
  else:
    beam_x = SIDE_R_X - (GUN_Y - ship_cy)
  return jnp.abs(ship_cx - beam_x) <= BEAM_HALF_W + SHIP_W / 2


def atlantis_step(state: AtlantisState, action: jax.Array):
  # ALE minimal-set order: 0 NOOP, 1 FIRE (center), 2 RIGHTFIRE, 3 LEFTFIRE.
  fire = jnp.stack([action == 3, action == 1, action == 2])  # (L, C, R)

  # Ship motion.
  speeds = jnp.asarray(BAND_SPEEDS, jnp.float32)[state.ship_band]
  sx = state.ship_x + state.ship_dir * speeds
  cy = _band_y(state.ship_band) + SHIP_H / 2.0

  # Firing: each ready gun downs the first live ship on its beam line.
  ready = fire & (state.cooldown <= 0)
  cx = sx + SHIP_W / 2.0
  hits = jnp.stack([
      _beam_hit(g, cx, cy) & state.ship_live & ready[g] for g in range(3)
  ])  # (3, NUM_BANDS)
  ship_hit = hits.any(axis=0)
  # Score by altitude band: 100·(band+1).
  reward = jnp.sum(
      jnp.where(ship_hit, 100.0 * (state.ship_band.astype(jnp.float32) + 1),
                0.0))
  live = state.ship_live & ~ship_hit
  cooldown = jnp.where(ready, FIRE_COOLDOWN,
                       jnp.maximum(state.cooldown - 1, 0))
  flash = jnp.where(ready, 3, jnp.maximum(state.flash - 1, 0))

  # A ship completing its pass drops one band; from band 0 it fires the
  # death ray: one city installation dies and the ship leaves.
  off = (sx < -float(SHIP_W)) | (sx > 160.0)
  finishing = live & off
  at_bottom = finishing & (state.ship_band == 0)
  band = jnp.where(finishing, jnp.maximum(state.ship_band - 1, 0),
                   state.ship_band)
  # Death ray: kill the first live city (deterministic order).
  ray = at_bottom.any()
  city_idx = jnp.argmax(state.city_live)  # first live city
  city_live = state.city_live.at[city_idx].set(
      jnp.where(ray, False, state.city_live[city_idx]))
  live = live & ~at_bottom
  # Finishing (non-bottom) ships re-enter on the other side one band lower.
  reenter = finishing & ~at_bottom
  sx = jnp.where(reenter, jnp.where(state.ship_dir > 0, -float(SHIP_W) + 1.0,
                                    159.0), sx)

  # Spawns: dead slots enter at their slot's spawn band = slot index.
  key, k_spawn, k_dir = jax.random.split(state.key, 3)
  do_spawn = ~live & (jax.random.uniform(k_spawn, (NUM_BANDS,)) < SPAWN_PROB)
  new_dir = jnp.where(jax.random.bernoulli(k_dir, 0.5, (NUM_BANDS,)),
                      1.0, -1.0)
  dirs = jnp.where(do_spawn, new_dir, state.ship_dir)
  band = jnp.where(do_spawn, jnp.arange(NUM_BANDS, dtype=jnp.int32), band)
  sx = jnp.where(do_spawn, jnp.where(dirs > 0, -float(SHIP_W) + 1.0, 159.0),
                 sx)
  live = live | do_spawn

  done = ~city_live.any()
  new_state = AtlantisState(sx, live, dirs, band, city_live, cooldown,
                            flash, key)
  return new_state, reward, done, jnp.zeros((), jnp.bool_)


def atlantis_render(state: AtlantisState) -> jax.Array:
  bg = (12, 12, 40)  # night sky
  sea = render.rect_mask(196, 210, 0, 160)
  frame = render.compose(bg, (sea, (26, 72, 118)))
  # City installations.
  for i in range(NUM_CITY):
    c = render.rect_mask(CITY_Y, CITY_Y + CITY_H, CITY_XS[i],
                         CITY_XS[i] + CITY_W)
    c = c & jnp.broadcast_to(state.city_live[i], (210, 160))
    frame = jnp.where(c[..., None], jnp.asarray((200, 170, 80), jnp.uint8),
                      frame)
  # Guns.
  for gx in (SIDE_L_X, CENTER_GUN_X, SIDE_R_X):
    g = render.rect_mask(GUN_Y, GUN_Y + 6, gx - 3, gx + 3)
    frame = jnp.where(g[..., None], jnp.asarray((180, 180, 180), jnp.uint8),
                      frame)
  # Beam flashes (vertical strip for center, diagonal strips are drawn as
  # thin vertical slices at their midpoint heights — a render-only cue).
  beams = jnp.zeros((210, 160), jnp.bool_)
  beams = beams | (render.rect_mask(30, int(GUN_Y), CENTER_GUN_X - 1,
                                    CENTER_GUN_X + 1)
                   & jnp.broadcast_to(state.flash[1] > 0, (210, 160)))
  rows = jnp.arange(210, dtype=jnp.float32)[:, None]
  cols = jnp.arange(160, dtype=jnp.float32)[None, :]
  diag_l = (jnp.abs((cols - SIDE_L_X) - (GUN_Y - rows)) < 1.5) & (rows < GUN_Y)
  diag_r = (jnp.abs((SIDE_R_X - cols) - (GUN_Y - rows)) < 1.5) & (rows < GUN_Y)
  beams = beams | (diag_l & jnp.broadcast_to(state.flash[0] > 0, (210, 160)))
  beams = beams | (diag_r & jnp.broadcast_to(state.flash[2] > 0, (210, 160)))
  frame = jnp.where(beams[..., None], jnp.asarray((236, 236, 120), jnp.uint8),
                    frame)
  # Ships.
  for i in range(NUM_BANDS):
    y = _band_y(state.ship_band[i])
    s = render.rect_mask(y, y + SHIP_H, state.ship_x[i],
                         state.ship_x[i] + SHIP_W)
    s = s & jnp.broadcast_to(state.ship_live[i], (210, 160))
    frame = jnp.where(s[..., None], jnp.asarray((170, 80, 170), jnp.uint8),
                      frame)
  return frame


GAME = register_game(Game(
    name="atlantis",
    num_actions=4,
    init=atlantis_init,
    step=atlantis_step,
    render=atlantis_render,
))
