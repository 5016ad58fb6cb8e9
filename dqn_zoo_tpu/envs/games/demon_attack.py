"""Demon Attack: diving demon waves over an ice field, 4 lives.

ALE-compatible surface (ref gym_atari.py:37-61 registers `demon_attack`
among the 57 cartridges; minimal action set 6: NOOP, FIRE, RIGHT, LEFT,
RIGHTFIRE, LEFTFIRE). Three demons hover at staggered heights, weave
horizontally, and drop bombs; destroying one scores wave-scaled points and
respawns it at the top after a delay. Clearing enough kills advances the
wave (faster demons, higher bounty — the cartridge's difficulty ramp).
Player explodes on bomb contact: 4 lives (ALE demon_attack reports 4),
life-loss signaling for the ZeroDiscountOnLifeLoss path
(processors.py:274-293).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

NUM_DEMONS = 3
DEMON_W, DEMON_H = 8, 8
DEMON_YS = (60.0, 90.0, 120.0)  # hover bands (top of each demon)
LEFT, RIGHT = 8.0, 152.0
PLAYER_Y = 180
PLAYER_W, PLAYER_H = 10, 8
PLAYER_SPEED = 3.0
SHOT_W, SHOT_SPEED = 2, 8.0
BOMB_W, BOMB_H, BOMB_SPEED = 2, 6, 3.0
BOMB_PROB = 0.022  # per-demon per-frame
LIVES = 4
RESPAWN_FRAMES = 40  # demon respawn delay after a kill
HIT_PAUSE = 30  # player invulnerability after losing a life
KILLS_PER_WAVE = 9
BASE_POINTS = 10.0  # wave w demon kill = (w+1) * 10 (cartridge ramps bounty)


class DemonAttackState(NamedTuple):
  player_x: jax.Array  # f32 left edge
  demon_x: jax.Array  # (N,) f32
  demon_dir: jax.Array  # (N,) f32 ±1 weave direction
  demon_live: jax.Array  # (N,) bool
  demon_delay: jax.Array  # (N,) i32 respawn countdown for dead demons
  shot_x: jax.Array  # f32
  shot_y: jax.Array  # f32
  shot_live: jax.Array  # bool
  bomb_x: jax.Array  # (N,) f32
  bomb_y: jax.Array  # (N,) f32
  bomb_live: jax.Array  # (N,) bool
  lives: jax.Array  # i32
  wave: jax.Array  # i32
  kills: jax.Array  # i32 kills this wave
  hit_pause: jax.Array  # i32
  key: jax.Array


def demon_attack_init(key: jax.Array) -> DemonAttackState:
  key, k1, k2, k3 = jax.random.split(key, 4)
  return DemonAttackState(
      player_x=jax.random.uniform(k1, (), minval=LEFT,
                                  maxval=RIGHT - PLAYER_W),
      demon_x=jax.random.uniform(k2, (NUM_DEMONS,), minval=LEFT,
                                 maxval=RIGHT - DEMON_W),
      demon_dir=jnp.where(
          jax.random.bernoulli(k3, shape=(NUM_DEMONS,)), 1.0, -1.0),
      demon_live=jnp.ones((NUM_DEMONS,), jnp.bool_),
      demon_delay=jnp.zeros((NUM_DEMONS,), jnp.int32),
      shot_x=jnp.zeros((), jnp.float32),
      shot_y=jnp.zeros((), jnp.float32),
      shot_live=jnp.zeros((), jnp.bool_),
      bomb_x=jnp.zeros((NUM_DEMONS,), jnp.float32),
      bomb_y=jnp.zeros((NUM_DEMONS,), jnp.float32),
      bomb_live=jnp.zeros((NUM_DEMONS,), jnp.bool_),
      lives=jnp.asarray(LIVES, jnp.int32),
      wave=jnp.zeros((), jnp.int32),
      kills=jnp.zeros((), jnp.int32),
      hit_pause=jnp.zeros((), jnp.int32),
      key=key,
  )


def demon_attack_step(state: DemonAttackState, action: jax.Array):
  right = (action == 2) | (action == 4)
  left = (action == 3) | (action == 5)
  fire = (action == 1) | (action == 4) | (action == 5)
  dx = jnp.where(right, PLAYER_SPEED, jnp.where(left, -PLAYER_SPEED, 0.0))
  player_x = jnp.clip(state.player_x + dx, LEFT, RIGHT - PLAYER_W)

  # Demons weave horizontally; speed ramps with the wave. A dead demon
  # counts down its respawn delay and re-enters at a random column.
  key, k_flip, k_spawn_x, k_bomb = jax.random.split(state.key, 4)
  speed = 1.2 + 0.3 * state.wave.astype(jnp.float32)
  demon_x = state.demon_x + state.demon_dir * speed * state.demon_live
  at_edge = (demon_x < LEFT) | (demon_x > RIGHT - DEMON_W)
  rand_flip = jax.random.uniform(k_flip, (NUM_DEMONS,)) < 0.02
  demon_dir = jnp.where(at_edge | rand_flip, -state.demon_dir,
                        state.demon_dir)
  demon_x = jnp.clip(demon_x, LEFT, RIGHT - DEMON_W)
  demon_delay = jnp.maximum(state.demon_delay - 1, 0)
  respawn = ~state.demon_live & (demon_delay == 0)
  demon_x = jnp.where(
      respawn,
      jax.random.uniform(k_spawn_x, (NUM_DEMONS,), minval=LEFT,
                         maxval=RIGHT - DEMON_W),
      demon_x)
  demon_live = state.demon_live | respawn

  # Player shot (one on screen, ALE-style).
  do_fire = fire & ~state.shot_live
  shot_x = jnp.where(do_fire, player_x + PLAYER_W / 2, state.shot_x)
  shot_y = jnp.where(do_fire, float(PLAYER_Y) - 2.0, state.shot_y)
  shot_live = state.shot_live | do_fire
  shot_y = shot_y - jnp.where(shot_live, SHOT_SPEED, 0.0)
  shot_live = shot_live & (shot_y > 40.0)

  # Shot ↔ demon collisions (vector over the 3 hover bands).
  demon_y = jnp.asarray(DEMON_YS, jnp.float32)
  hit = (shot_live & demon_live
         & (shot_x + SHOT_W >= demon_x) & (shot_x <= demon_x + DEMON_W)
         & (shot_y <= demon_y + DEMON_H) & (shot_y + 6.0 >= demon_y))
  # One shot kills at most one demon: the lowest (closest) hit band wins.
  any_hit = hit.any()
  low_idx = NUM_DEMONS - 1 - jnp.argmax(hit[::-1])
  kill = hit & (jnp.arange(NUM_DEMONS) == low_idx) & any_hit
  demon_live = demon_live & ~kill
  demon_delay = jnp.where(kill, RESPAWN_FRAMES, demon_delay)
  shot_live = shot_live & ~any_hit
  reward = jnp.where(any_hit,
                     BASE_POINTS * (state.wave + 1).astype(jnp.float32),
                     0.0)
  kills = state.kills + any_hit.astype(jnp.int32)

  # Bombs: each live demon may drop one (one in flight per demon).
  do_bomb = (demon_live & ~state.bomb_live
             & (jax.random.uniform(k_bomb, (NUM_DEMONS,)) < BOMB_PROB))
  bomb_x = jnp.where(do_bomb, demon_x + DEMON_W / 2, state.bomb_x)
  bomb_y = jnp.where(do_bomb, demon_y + DEMON_H, state.bomb_y)
  bomb_live = state.bomb_live | do_bomb
  bomb_y = bomb_y + jnp.where(bomb_live, BOMB_SPEED, 0.0)
  bomb_live = bomb_live & (bomb_y < 200.0)

  # Bomb ↔ player (skipped during post-hit pause).
  vulnerable = state.hit_pause <= 0
  hit_pause = jnp.maximum(state.hit_pause - 1, 0)
  overlap = (bomb_live
             & (bomb_x + BOMB_W >= player_x) & (bomb_x <= player_x + PLAYER_W)
             & (bomb_y + BOMB_H >= PLAYER_Y)
             & (bomb_y <= PLAYER_Y + PLAYER_H))
  player_hit = overlap.any() & vulnerable
  bomb_live = bomb_live & ~player_hit
  lives = state.lives - player_hit.astype(jnp.int32)
  hit_pause = jnp.where(player_hit, HIT_PAUSE, hit_pause)

  # Wave advance after enough kills: bounty and speed ramp.
  next_wave = kills >= KILLS_PER_WAVE
  wave = state.wave + next_wave.astype(jnp.int32)
  kills = jnp.where(next_wave, 0, kills)

  done = lives <= 0
  new_state = DemonAttackState(
      player_x, demon_x, demon_dir, demon_live, demon_delay,
      shot_x, shot_y, shot_live, bomb_x, bomb_y, bomb_live,
      lives, wave, kills, hit_pause, key)
  life_lost = player_hit & ~done
  return new_state, reward, done, life_lost


def demon_attack_render(state: DemonAttackState) -> jax.Array:
  bg = (0, 0, 0)
  ice = render.rect_mask(190, 210, 0, 160)  # ice field below the cannon
  demons = jnp.zeros((210, 160), jnp.bool_)
  for i in range(NUM_DEMONS):
    d = render.rect_mask(DEMON_YS[i], DEMON_YS[i] + DEMON_H,
                         state.demon_x[i], state.demon_x[i] + DEMON_W)
    demons = demons | (d & jnp.broadcast_to(state.demon_live[i], (210, 160)))
  bombs = jnp.zeros((210, 160), jnp.bool_)
  for i in range(NUM_DEMONS):
    b = render.rect_mask(state.bomb_y[i], state.bomb_y[i] + BOMB_H,
                         state.bomb_x[i], state.bomb_x[i] + BOMB_W)
    bombs = bombs | (b & jnp.broadcast_to(state.bomb_live[i], (210, 160)))
  shot = render.rect_mask(state.shot_y, state.shot_y + 6,
                          state.shot_x, state.shot_x + SHOT_W)
  player = render.rect_mask(PLAYER_Y, PLAYER_Y + PLAYER_H,
                            state.player_x, state.player_x + PLAYER_W)
  return render.compose(
      bg,
      (ice, (84, 92, 214)),
      (demons, (228, 111, 111)),
      (bombs, (236, 140, 30)),
      (shot & jnp.broadcast_to(state.shot_live, (210, 160)),
       (236, 236, 236)),
      (player, (184, 70, 162)),
  )


GAME = register_game(Game(
    name="demon_attack",
    num_actions=6,
    init=demon_attack_init,
    step=demon_attack_step,
    render=demon_attack_render,
    lives=lambda state: state.lives,
))
