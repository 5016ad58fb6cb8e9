"""Phoenix: swooping bird flock with a deployable shield, 5 lives.

ALE-compatible surface (ref gym_atari.py:37-61; minimal action set 8:
NOOP, FIRE, RIGHT, LEFT, DOWN, RIGHTFIRE, LEFTFIRE, DOWNFIRE — DOWN raises
the ship's shield). Eight birds weave in two ranks and periodically dive at
the ship; a dive that connects costs a life unless the shield is up (the
shield then destroys the diver for bonus points). Shot birds score 20
(upper rank 40); cleared flocks respawn faster each wave.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

NUM_BIRDS = 8  # two ranks of four
BIRD_W, BIRD_H = 8, 6
RANK_YS = (56.0, 76.0)  # hover rows (top edge) for ranks 0 and 1
LEFT, RIGHT = 8.0, 152.0
PLAYER_Y = 180
PLAYER_W, PLAYER_H = 10, 8
PLAYER_SPEED = 3.0
SHOT_W, SHOT_SPEED = 2, 7.0
DIVE_PROB = 0.012  # per-bird per-frame chance to start a dive
DIVE_SPEED = 3.2
LIVES = 5
RESPAWN_FRAMES = 45
HIT_PAUSE = 30
SHIELD_FRAMES = 24  # shield stays up this long once raised
SHIELD_COOLDOWN = 40
POINTS = (25.0, 12.0)  # per rank (upper rank pays more)
DIVER_BONUS = 40.0  # shield-kill or shooting a diving bird


class PhoenixState(NamedTuple):
  player_x: jax.Array  # f32 left edge
  bird_x: jax.Array  # (N,) f32
  bird_y: jax.Array  # (N,) f32 (hover row or diving position)
  bird_dir: jax.Array  # (N,) f32 ±1 weave direction
  bird_live: jax.Array  # (N,) bool
  bird_diving: jax.Array  # (N,) bool
  bird_delay: jax.Array  # (N,) i32 respawn countdown
  shot_x: jax.Array  # f32
  shot_y: jax.Array  # f32
  shot_live: jax.Array  # bool
  shield: jax.Array  # i32 frames of shield remaining
  shield_cd: jax.Array  # i32 cooldown until shield can be raised again
  lives: jax.Array  # i32
  wave: jax.Array  # i32
  hit_pause: jax.Array  # i32
  key: jax.Array


# Host constants (folded in at trace time; no device allocation at import).
import numpy as np

_RANK_Y = np.asarray([RANK_YS[0]] * 4 + [RANK_YS[1]] * 4, np.float32)
_RANK_POINTS = np.asarray([POINTS[0]] * 4 + [POINTS[1]] * 4, np.float32)


def phoenix_init(key: jax.Array) -> PhoenixState:
  key, k1, k2, k3 = jax.random.split(key, 4)
  return PhoenixState(
      player_x=jax.random.uniform(k1, (), minval=LEFT,
                                  maxval=RIGHT - PLAYER_W),
      bird_x=jax.random.uniform(k2, (NUM_BIRDS,), minval=LEFT,
                                maxval=RIGHT - BIRD_W),
      bird_y=jnp.asarray(_RANK_Y, jnp.float32),
      bird_dir=jnp.where(
          jax.random.bernoulli(k3, shape=(NUM_BIRDS,)), 1.0, -1.0),
      bird_live=jnp.ones((NUM_BIRDS,), jnp.bool_),
      bird_diving=jnp.zeros((NUM_BIRDS,), jnp.bool_),
      bird_delay=jnp.zeros((NUM_BIRDS,), jnp.int32),
      shot_x=jnp.zeros((), jnp.float32),
      shot_y=jnp.zeros((), jnp.float32),
      shot_live=jnp.zeros((), jnp.bool_),
      shield=jnp.zeros((), jnp.int32),
      shield_cd=jnp.zeros((), jnp.int32),
      lives=jnp.asarray(LIVES, jnp.int32),
      wave=jnp.zeros((), jnp.int32),
      hit_pause=jnp.zeros((), jnp.int32),
      key=key,
  )


def phoenix_step(state: PhoenixState, action: jax.Array):
  right = (action == 2) | (action == 5)
  left = (action == 3) | (action == 6)
  fire = (action == 1) | (action == 5) | (action == 6) | (action == 7)
  shield_btn = (action == 4) | (action == 7)
  dx = jnp.where(right, PLAYER_SPEED, jnp.where(left, -PLAYER_SPEED, 0.0))
  player_x = jnp.clip(state.player_x + dx, LEFT, RIGHT - PLAYER_W)

  # Shield timing: raise on DOWN when off cooldown; runs down then cools.
  raise_shield = shield_btn & (state.shield_cd <= 0) & (state.shield <= 0)
  shield = jnp.where(raise_shield, SHIELD_FRAMES,
                     jnp.maximum(state.shield - 1, 0))
  shield_cd = jnp.where(raise_shield, SHIELD_COOLDOWN,
                        jnp.maximum(state.shield_cd - 1, 0))
  shield_up = shield > 0

  # Bird motion: weave at hover row; divers home on the ship.
  key, k_flip, k_dive, k_spawn = jax.random.split(state.key, 4)
  speed = 1.0 + 0.25 * state.wave.astype(jnp.float32)
  weave_x = state.bird_x + state.bird_dir * speed
  at_edge = (weave_x < LEFT) | (weave_x > RIGHT - BIRD_W)
  rand_flip = jax.random.uniform(k_flip, (NUM_BIRDS,)) < 0.03
  bird_dir = jnp.where(at_edge | rand_flip, -state.bird_dir, state.bird_dir)
  weave_x = jnp.clip(weave_x, LEFT, RIGHT - BIRD_W)

  start_dive = (state.bird_live & ~state.bird_diving
                & (jax.random.uniform(k_dive, (NUM_BIRDS,)) < DIVE_PROB))
  diving = (state.bird_diving | start_dive) & state.bird_live
  # Divers descend and steer toward the player's column.
  steer = jnp.clip(player_x - state.bird_x, -2.0, 2.0)
  dive_x = jnp.clip(state.bird_x + steer, LEFT, RIGHT - BIRD_W)
  dive_y = state.bird_y + DIVE_SPEED
  bird_x = jnp.where(diving, dive_x, weave_x)
  bird_y = jnp.where(diving, dive_y, _RANK_Y)
  # A diver that overflies the ship row returns to its rank.
  returned = diving & (bird_y > 200.0)
  diving = diving & ~returned
  bird_y = jnp.where(returned, _RANK_Y, bird_y)

  # Respawns.
  bird_delay = jnp.maximum(state.bird_delay - 1, 0)
  respawn = ~state.bird_live & (bird_delay == 0)
  bird_x = jnp.where(
      respawn,
      jax.random.uniform(k_spawn, (NUM_BIRDS,), minval=LEFT,
                         maxval=RIGHT - BIRD_W),
      bird_x)
  bird_y = jnp.where(respawn, _RANK_Y, bird_y)
  bird_live = state.bird_live | respawn

  # Player shot.
  do_fire = fire & ~state.shot_live
  shot_x = jnp.where(do_fire, player_x + PLAYER_W / 2, state.shot_x)
  shot_y = jnp.where(do_fire, float(PLAYER_Y) - 2.0, state.shot_y)
  shot_live = state.shot_live | do_fire
  shot_y = shot_y - jnp.where(shot_live, SHOT_SPEED, 0.0)
  shot_live = shot_live & (shot_y > 40.0)

  hit = (shot_live & bird_live
         & (shot_x + SHOT_W >= bird_x) & (shot_x <= bird_x + BIRD_W)
         & (shot_y <= bird_y + BIRD_H) & (shot_y + 6.0 >= bird_y))
  any_hit = hit.any()
  low_idx = NUM_BIRDS - 1 - jnp.argmax(hit[::-1])
  kill = hit & (jnp.arange(NUM_BIRDS) == low_idx) & any_hit
  shot_live = shot_live & ~any_hit
  shot_reward = jnp.sum(
      jnp.where(kill,
                jnp.where(diving, DIVER_BONUS, _RANK_POINTS), 0.0))

  # Diver ↔ ship contact: shield kills the diver (bonus), else life lost.
  vulnerable = state.hit_pause <= 0
  hit_pause = jnp.maximum(state.hit_pause - 1, 0)
  contact = (diving & bird_live
             & (bird_x + BIRD_W >= player_x) & (bird_x <= player_x + PLAYER_W)
             & (bird_y + BIRD_H >= PLAYER_Y)
             & (bird_y <= PLAYER_Y + PLAYER_H))
  shield_kill = contact & shield_up
  crash = contact.any() & ~shield_up & vulnerable
  killed = kill | shield_kill
  bird_live = bird_live & ~killed
  diving = diving & ~killed
  bird_delay = jnp.where(killed, RESPAWN_FRAMES, bird_delay)
  reward = shot_reward + jnp.sum(jnp.where(shield_kill, DIVER_BONUS, 0.0))
  lives = state.lives - crash.astype(jnp.int32)
  hit_pause = jnp.where(crash, HIT_PAUSE, hit_pause)

  # Flock cleared (all waiting on respawn) → next wave spawns faster.
  cleared = ~bird_live.any()
  wave = state.wave + cleared.astype(jnp.int32)

  done = lives <= 0
  new_state = PhoenixState(
      player_x, bird_x, bird_y, bird_dir, bird_live, diving, bird_delay,
      shot_x, shot_y, shot_live, shield, shield_cd, lives, wave,
      hit_pause, key)
  life_lost = crash & ~done
  return new_state, reward, done, life_lost


def phoenix_render(state: PhoenixState) -> jax.Array:
  bg = (0, 0, 0)
  birds = jnp.zeros((210, 160), jnp.bool_)
  for i in range(NUM_BIRDS):
    b = render.rect_mask(state.bird_y[i], state.bird_y[i] + BIRD_H,
                         state.bird_x[i], state.bird_x[i] + BIRD_W)
    birds = birds | (b & jnp.broadcast_to(state.bird_live[i], (210, 160)))
  shot = render.rect_mask(state.shot_y, state.shot_y + 6,
                          state.shot_x, state.shot_x + SHOT_W)
  player = render.rect_mask(PLAYER_Y, PLAYER_Y + PLAYER_H,
                            state.player_x, state.player_x + PLAYER_W)
  shield = render.rect_mask(PLAYER_Y - 6, PLAYER_Y - 2,
                            state.player_x - 2, state.player_x + PLAYER_W + 2)
  shield = shield & jnp.broadcast_to(state.shield > 0, (210, 160))
  stars = render.rect_mask(40, 42, 0, 160)  # dim horizon band
  return render.compose(
      bg,
      (stars, (52, 52, 94)),
      (birds, (212, 160, 56)),
      (shot & jnp.broadcast_to(state.shot_live, (210, 160)),
       (236, 236, 236)),
      (shield, (110, 190, 230)),
      (player, (80, 160, 220)),
  )


GAME = register_game(Game(
    name="phoenix",
    num_actions=8,
    init=phoenix_init,
    step=phoenix_step,
    render=phoenix_render,
    lives=lambda state: state.lives,
))
