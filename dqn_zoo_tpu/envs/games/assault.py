"""Assault: mothership drones and an overheating turret, 4 lives.

ALE-compatible surface (ref gym_atari.py:37-61; minimal action set 7:
NOOP, UP, FIRE, RIGHT, LEFT, RIGHTFIRE, LEFTFIRE — UP fires vertically,
FIRE is the side cannon in the cartridge; here both shoot, UP from the
turret top and FIRE at the current facing). A mothership tracks overhead
and deploys up to three drones that descend in steps and strafe; drones
drop bombs. The turret has a HEAT meter: every shot adds heat, overheating
destroys the turret (a life), idling cools it — the cartridge's signature
risk mechanic. Drone kill 21 points; bombed/overheated → life lost.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

NUM_DRONES = 3
DRONE_W, DRONE_H = 14, 7
LEFT, RIGHT = 8.0, 152.0
MOTHER_Y, MOTHER_W, MOTHER_H = 42.0, 24, 8
PLAYER_Y = 180
PLAYER_W, PLAYER_H = 10, 8
PLAYER_SPEED = 3.0
SHOT_W, SHOT_SPEED = 2, 7.0
BOMB_W, BOMB_H, BOMB_SPEED = 2, 6, 2.8
BOMB_PROB = 0.012
DRONE_DROP = 0.55  # px/frame descent
LIVES = 4
SPAWN_DELAY = 50
HIT_PAUSE = 30
HEAT_PER_SHOT = 25
HEAT_MAX = 100
COOL_PER_FRAME = 1
DRONE_POINTS = 21.0  # the cartridge's per-drone increment
MOTHER_POINTS = 150.0
MOTHER_HITS = 6  # hits to down the mothership


class AssaultState(NamedTuple):
  player_x: jax.Array  # f32 left edge
  mother_x: jax.Array  # f32
  mother_dir: jax.Array  # f32 ±1
  mother_hp: jax.Array  # i32 hits remaining
  drone_x: jax.Array  # (N,) f32
  drone_y: jax.Array  # (N,) f32
  drone_dir: jax.Array  # (N,) f32
  drone_live: jax.Array  # (N,) bool
  drone_delay: jax.Array  # (N,) i32 deploy countdown
  shot_x: jax.Array  # f32
  shot_y: jax.Array  # f32
  shot_live: jax.Array  # bool
  bomb_x: jax.Array  # (N,) f32
  bomb_y: jax.Array  # (N,) f32
  bomb_live: jax.Array  # (N,) bool
  heat: jax.Array  # i32
  lives: jax.Array  # i32
  wave: jax.Array  # i32
  hit_pause: jax.Array  # i32
  key: jax.Array


def assault_init(key: jax.Array) -> AssaultState:
  key, k1, k2 = jax.random.split(key, 3)
  return AssaultState(
      player_x=jax.random.uniform(k1, (), minval=LEFT,
                                  maxval=RIGHT - PLAYER_W),
      mother_x=jnp.asarray(70.0, jnp.float32),
      mother_dir=jnp.where(jax.random.bernoulli(k2), 1.0, -1.0),
      mother_hp=jnp.asarray(MOTHER_HITS, jnp.int32),
      drone_x=jnp.zeros((NUM_DRONES,), jnp.float32),
      drone_y=jnp.zeros((NUM_DRONES,), jnp.float32),
      drone_dir=jnp.ones((NUM_DRONES,), jnp.float32),
      drone_live=jnp.zeros((NUM_DRONES,), jnp.bool_),
      drone_delay=jnp.asarray([10, 60, 110], jnp.int32),
      shot_x=jnp.zeros((), jnp.float32),
      shot_y=jnp.zeros((), jnp.float32),
      shot_live=jnp.zeros((), jnp.bool_),
      bomb_x=jnp.zeros((NUM_DRONES,), jnp.float32),
      bomb_y=jnp.zeros((NUM_DRONES,), jnp.float32),
      bomb_live=jnp.zeros((NUM_DRONES,), jnp.bool_),
      heat=jnp.zeros((), jnp.int32),
      lives=jnp.asarray(LIVES, jnp.int32),
      wave=jnp.zeros((), jnp.int32),
      hit_pause=jnp.zeros((), jnp.int32),
      key=key,
  )


def assault_step(state: AssaultState, action: jax.Array):
  right = (action == 3) | (action == 5)
  left = (action == 4) | (action == 6)
  fire = (action == 1) | (action == 2) | (action == 5) | (action == 6)
  dx = jnp.where(right, PLAYER_SPEED, jnp.where(left, -PLAYER_SPEED, 0.0))
  player_x = jnp.clip(state.player_x + dx, LEFT, RIGHT - PLAYER_W)

  # Mothership tracks slowly above the field.
  mother_x = state.mother_x + state.mother_dir * (
      0.8 + 0.2 * state.wave.astype(jnp.float32))
  m_edge = (mother_x < LEFT) | (mother_x > RIGHT - MOTHER_W)
  mother_dir = jnp.where(m_edge, -state.mother_dir, state.mother_dir)
  mother_x = jnp.clip(mother_x, LEFT, RIGHT - MOTHER_W)

  # Drones: deploy from the mothership after their delay, then strafe and
  # sink toward the turret row.
  key, k_flip, k_bomb = jax.random.split(state.key, 3)
  drone_delay = jnp.maximum(state.drone_delay - 1, 0)
  deploy = ~state.drone_live & (drone_delay == 0)
  drone_x = jnp.where(deploy, mother_x + MOTHER_W / 2, state.drone_x)
  drone_y = jnp.where(deploy, MOTHER_Y + MOTHER_H + 2.0, state.drone_y)
  drone_live = state.drone_live | deploy
  speed = 1.4 + 0.3 * state.wave.astype(jnp.float32)
  drone_x = drone_x + state.drone_dir * speed * drone_live
  d_edge = (drone_x < LEFT) | (drone_x > RIGHT - DRONE_W)
  rand_flip = jax.random.uniform(k_flip, (NUM_DRONES,)) < 0.02
  drone_dir = jnp.where(d_edge | rand_flip, -state.drone_dir,
                        state.drone_dir)
  drone_x = jnp.clip(drone_x, LEFT, RIGHT - DRONE_W)
  drone_y = drone_y + jnp.where(drone_live, DRONE_DROP, 0.0)
  drone_y = jnp.minimum(drone_y, float(PLAYER_Y) - DRONE_H - 2.0)

  # Turret shot + heat. Firing with a live shot still adds heat (the
  # cartridge punishes trigger-mashing).
  do_fire = fire & ~state.shot_live & (state.hit_pause <= 0)
  shot_x = jnp.where(do_fire, player_x + PLAYER_W / 2, state.shot_x)
  shot_y = jnp.where(do_fire, float(PLAYER_Y) - 2.0, state.shot_y)
  shot_live = state.shot_live | do_fire
  shot_y = shot_y - jnp.where(shot_live, SHOT_SPEED, 0.0)
  shot_live = shot_live & (shot_y > MOTHER_Y - 4.0)
  heat = jnp.maximum(state.heat - COOL_PER_FRAME, 0) + jnp.where(
      do_fire, HEAT_PER_SHOT, 0)
  overheat = heat >= HEAT_MAX
  heat = jnp.where(overheat, 0, heat)

  # Shot ↔ drones.
  hit = (shot_live & drone_live
         & (shot_x + SHOT_W >= drone_x) & (shot_x <= drone_x + DRONE_W)
         & (shot_y <= drone_y + DRONE_H) & (shot_y + 6.0 >= drone_y))
  any_hit = hit.any()
  low_idx = NUM_DRONES - 1 - jnp.argmax(hit[::-1])
  kill = hit & (jnp.arange(NUM_DRONES) == low_idx) & any_hit
  drone_live = drone_live & ~kill
  drone_delay = jnp.where(kill, SPAWN_DELAY, drone_delay)
  reward = jnp.where(any_hit, DRONE_POINTS, 0.0)
  shot_live = shot_live & ~any_hit

  # Shot ↔ mothership (only when no drone intercepted it).
  m_hit = (shot_live
           & (shot_x + SHOT_W >= mother_x) & (shot_x <= mother_x + MOTHER_W)
           & (shot_y <= MOTHER_Y + MOTHER_H) & (shot_y + 6.0 >= MOTHER_Y))
  mother_hp = state.mother_hp - m_hit.astype(jnp.int32)
  shot_live = shot_live & ~m_hit
  downed = mother_hp <= 0
  reward = reward + jnp.where(downed, MOTHER_POINTS, 0.0)
  wave = state.wave + downed.astype(jnp.int32)
  mother_hp = jnp.where(downed, MOTHER_HITS, mother_hp)

  # Drone bombs.
  do_bomb = (drone_live & ~state.bomb_live
             & (jax.random.uniform(k_bomb, (NUM_DRONES,)) < BOMB_PROB))
  bomb_x = jnp.where(do_bomb, drone_x + DRONE_W / 2, state.bomb_x)
  bomb_y = jnp.where(do_bomb, drone_y + DRONE_H, state.bomb_y)
  bomb_live = state.bomb_live | do_bomb
  bomb_y = bomb_y + jnp.where(bomb_live, BOMB_SPEED, 0.0)
  bomb_live = bomb_live & (bomb_y < 200.0)

  # Bomb ↔ turret, plus drone body contact at turret height.
  vulnerable = state.hit_pause <= 0
  hit_pause = jnp.maximum(state.hit_pause - 1, 0)
  bombed = (bomb_live
            & (bomb_x + BOMB_W >= player_x) & (bomb_x <= player_x + PLAYER_W)
            & (bomb_y + BOMB_H >= PLAYER_Y)
            & (bomb_y <= PLAYER_Y + PLAYER_H))
  rammed = (drone_live
            & (drone_x + DRONE_W >= player_x)
            & (drone_x <= player_x + PLAYER_W)
            & (drone_y + DRONE_H >= PLAYER_Y - 2.0))
  destroyed = (bombed.any() | rammed.any() | overheat) & vulnerable
  bomb_live = bomb_live & ~destroyed
  lives = state.lives - destroyed.astype(jnp.int32)
  hit_pause = jnp.where(destroyed, HIT_PAUSE, hit_pause)

  done = lives <= 0
  new_state = AssaultState(
      player_x, mother_x, mother_dir, mother_hp, drone_x, drone_y,
      drone_dir, drone_live, drone_delay, shot_x, shot_y, shot_live,
      bomb_x, bomb_y, bomb_live, heat, lives, wave, hit_pause, key)
  life_lost = destroyed & ~done
  return new_state, reward, done, life_lost


def assault_render(state: AssaultState) -> jax.Array:
  bg = (0, 0, 0)
  ground = render.rect_mask(192, 196, 0, 160)
  mother = render.rect_mask(MOTHER_Y, MOTHER_Y + MOTHER_H,
                            state.mother_x, state.mother_x + MOTHER_W)
  drones = jnp.zeros((210, 160), jnp.bool_)
  for i in range(NUM_DRONES):
    d = render.rect_mask(state.drone_y[i], state.drone_y[i] + DRONE_H,
                         state.drone_x[i], state.drone_x[i] + DRONE_W)
    drones = drones | (d & jnp.broadcast_to(state.drone_live[i], (210, 160)))
  bombs = jnp.zeros((210, 160), jnp.bool_)
  for i in range(NUM_DRONES):
    b = render.rect_mask(state.bomb_y[i], state.bomb_y[i] + BOMB_H,
                         state.bomb_x[i], state.bomb_x[i] + BOMB_W)
    bombs = bombs | (b & jnp.broadcast_to(state.bomb_live[i], (210, 160)))
  shot = render.rect_mask(state.shot_y, state.shot_y + 6,
                          state.shot_x, state.shot_x + SHOT_W)
  player = render.rect_mask(PLAYER_Y, PLAYER_Y + PLAYER_H,
                            state.player_x, state.player_x + PLAYER_W)
  # Heat bar along the bottom: length tracks the meter (visible state).
  heat_w = state.heat.astype(jnp.float32) * (140.0 / HEAT_MAX)
  heat_bar = render.rect_mask(200, 204, 10, 10 + heat_w)
  return render.compose(
      bg,
      (ground, (120, 120, 120)),
      (mother, (170, 80, 170)),
      (drones, (210, 170, 80)),
      (bombs, (236, 140, 30)),
      (shot & jnp.broadcast_to(state.shot_live, (210, 160)),
       (236, 236, 236)),
      (player, (90, 186, 90)),
      (heat_bar, (220, 60, 60)),
  )


GAME = register_game(Game(
    name="assault",
    num_actions=7,
    init=assault_init,
    step=assault_step,
    render=assault_render,
    lives=lambda state: state.lives,
))
