"""Ice Hockey: 1-on-1 rink with a game clock, signed goal scoring.

ALE-compatible surface (ref gym_atari.py:37-61; full 18-action set like the
cartridge — movement in 8 directions × fire, fire = shoot the carried puck).
The player skates the lower half, the computer opponent the upper half; the
puck is carried on contact and shot toward the opposing goal. Scoring is
SIGNED like the cartridge (+1 player goal into the top net, −1 opponent
goal into the bottom net; typical returns −15..+10, the anchor table's
random score is −11.2, run/atari_data.py). The episode ends on the game
clock, not lives — like tennis, there is no lives signal.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs import render
from dqn_zoo_tpu.envs.api import Game, register_game

TOP, BOTTOM = 40.0, 190.0
LEFT, RIGHT = 12.0, 148.0
GOAL_X0, GOAL_X1 = 62.0, 98.0  # goal mouths (top & bottom walls)
P_W, P_H = 8, 12
PLAYER_SPEED = 2.2
ENEMY_SPEED = 1.8
PUCK = 3
SHOT_SPEED = 4.5
CLOCK_FRAMES = 12000  # ~3:20 at 60 Hz — the cartridge's timed periods
CARRY_OFF = 2.0  # puck rides this far in front of the carrier


class IceHockeyState(NamedTuple):
  px: jax.Array  # player left edge, f32
  py: jax.Array
  ex: jax.Array  # enemy
  ey: jax.Array
  puck_x: jax.Array
  puck_y: jax.Array
  puck_vx: jax.Array
  puck_vy: jax.Array
  carrier: jax.Array  # i32: 0 loose, 1 player, 2 enemy
  frame: jax.Array  # i32 game clock
  faceoff_delay: jax.Array  # i32 frames until puck live after a goal
  key: jax.Array


def _decode(action):
  """ALE 18-action decode (shared with boxing): direction + fire bit."""
  fire = (action == 1) | (action >= 10)
  a = jnp.where(action >= 10, action - 8, action)  # 10..17 -> 2..9
  up = (a == 2) | (a == 6) | (a == 7)
  right = (a == 3) | (a == 6) | (a == 8)
  left = (a == 4) | (a == 7) | (a == 9)
  down = (a == 5) | (a == 8) | (a == 9)
  dx = right.astype(jnp.float32) - left.astype(jnp.float32)
  dy = down.astype(jnp.float32) - up.astype(jnp.float32)
  return dx, dy, fire


def ice_hockey_init(key: jax.Array) -> IceHockeyState:
  key, k1 = jax.random.split(key)
  return IceHockeyState(
      px=jnp.asarray(76.0, jnp.float32),
      py=jnp.asarray(150.0, jnp.float32),
      ex=jnp.asarray(76.0, jnp.float32),
      ey=jnp.asarray(66.0, jnp.float32),
      puck_x=jnp.asarray(78.0, jnp.float32),
      puck_y=jax.random.uniform(k1, (), minval=100.0, maxval=120.0),
      puck_vx=jnp.zeros(()),
      puck_vy=jnp.zeros(()),
      carrier=jnp.zeros((), jnp.int32),
      frame=jnp.zeros((), jnp.int32),
      faceoff_delay=jnp.zeros((), jnp.int32),
      key=key,
  )


def ice_hockey_step(state: IceHockeyState, action: jax.Array):
  dx, dy, fire = _decode(action)
  px = jnp.clip(state.px + dx * PLAYER_SPEED, LEFT, RIGHT - P_W)
  py = jnp.clip(state.py + dy * PLAYER_SPEED, (TOP + BOTTOM) / 2, BOTTOM - P_H)

  # Enemy AI: chase the puck in the upper half, retreat toward its goal
  # mouth when the player carries.
  target_x = jnp.where(state.carrier == 1,
                       (GOAL_X0 + GOAL_X1) / 2 - P_W / 2,
                       state.puck_x - P_W / 2)
  target_y = jnp.where(state.carrier == 1, TOP + 8.0,
                       jnp.minimum(state.puck_y, (TOP + BOTTOM) / 2 - P_H))
  ex = state.ex + jnp.clip(target_x - state.ex, -ENEMY_SPEED, ENEMY_SPEED)
  ey = state.ey + jnp.clip(target_y - state.ey, -ENEMY_SPEED, ENEMY_SPEED)
  ex = jnp.clip(ex, LEFT, RIGHT - P_W)
  ey = jnp.clip(ey, TOP, (TOP + BOTTOM) / 2 - P_H)

  faceoff = jnp.maximum(state.faceoff_delay - 1, 0)
  live = faceoff == 0

  # Puck motion / carry.
  carried_p = state.carrier == 1
  carried_e = state.carrier == 2
  puck_x = jnp.where(carried_p, px + P_W / 2,
                     jnp.where(carried_e, ex + P_W / 2, state.puck_x))
  puck_y = jnp.where(carried_p, py - CARRY_OFF,
                     jnp.where(carried_e, ey + P_H + CARRY_OFF,
                               state.puck_y))
  puck_vx = jnp.where(state.carrier > 0, 0.0, state.puck_vx)
  puck_vy = jnp.where(state.carrier > 0, 0.0, state.puck_vy)
  puck_x = puck_x + puck_vx * live
  puck_y = puck_y + puck_vy * live
  # Wall bounces (goal mouths handled below) + friction.
  bounce_x = (puck_x < LEFT) | (puck_x > RIGHT - PUCK)
  puck_vx = jnp.where(bounce_x, -puck_vx, puck_vx) * 0.985
  puck_x = jnp.clip(puck_x, LEFT, RIGHT - PUCK)
  in_mouth = (puck_x >= GOAL_X0) & (puck_x + PUCK <= GOAL_X1)
  bounce_y = ((puck_y < TOP) | (puck_y > BOTTOM - PUCK)) & ~in_mouth
  puck_vy = jnp.where(bounce_y, -puck_vy, puck_vy) * 0.985
  puck_y = jnp.where(in_mouth, puck_y, jnp.clip(puck_y, TOP, BOTTOM - PUCK))

  # Pickup: loose puck touching a skater sticks to them.
  touch_p = (live & (state.carrier == 0)
             & (puck_x + PUCK >= px) & (puck_x <= px + P_W)
             & (puck_y + PUCK >= py) & (puck_y <= py + P_H))
  touch_e = (live & (state.carrier == 0) & ~touch_p
             & (puck_x + PUCK >= ex) & (puck_x <= ex + P_W)
             & (puck_y + PUCK >= ey) & (puck_y <= ey + P_H))
  carrier = jnp.where(touch_p, 1, jnp.where(touch_e, 2, state.carrier))

  # Steal: skaters overlapping swaps possession toward the defender.
  overlap = ((px + P_W >= ex) & (px <= ex + P_W)
             & (py <= ey + P_H + 2) & (py + P_H >= ey - 2))
  carrier = jnp.where(overlap & (carrier == 2), 1, carrier)

  # Shots. Player shoots toward the top goal mouth, enemy (on a timer)
  # toward the bottom one, with an aiming error.
  key, k_aim, k_eshoot = jax.random.split(state.key, 3)
  # The aim band is WIDER than the goal mouth so a fraction of shots
  # clang off the end boards — keeps random-play goal rates near the
  # cartridge's (anchor -11.2/episode, run/atari_data.py).
  aim = jax.random.uniform(k_aim, (), minval=GOAL_X0 - 10.0,
                           maxval=GOAL_X1 + 10.0 - PUCK)
  p_shoot = (carrier == 1) & fire
  dxs = (aim - puck_x) / jnp.maximum(puck_y - TOP, 1.0)
  puck_vx = jnp.where(p_shoot, jnp.clip(dxs * SHOT_SPEED, -3.0, 3.0),
                      puck_vx)
  puck_vy = jnp.where(p_shoot, -SHOT_SPEED, puck_vy)
  e_shoot = (carrier == 2) & (jax.random.uniform(k_eshoot, ()) < 0.0028)
  dxe = (aim - puck_x) / jnp.maximum(BOTTOM - puck_y, 1.0)
  puck_vx = jnp.where(e_shoot, jnp.clip(dxe * SHOT_SPEED, -3.0, 3.0),
                      puck_vx)
  puck_vy = jnp.where(e_shoot, SHOT_SPEED, puck_vy)
  carrier = jnp.where(p_shoot | e_shoot, 0, carrier)

  # Goals: crossing a goal mouth scores; signed reward, center faceoff.
  player_goal = (puck_y <= TOP - 1.0) & in_mouth
  enemy_goal = (puck_y >= BOTTOM - PUCK + 1.0) & in_mouth
  reward = player_goal.astype(jnp.float32) - enemy_goal.astype(jnp.float32)
  scored = player_goal | enemy_goal
  puck_x = jnp.where(scored, 78.0, puck_x)
  puck_y = jnp.where(scored, 114.0, puck_y)
  puck_vx = jnp.where(scored, 0.0, puck_vx)
  puck_vy = jnp.where(scored, 0.0, puck_vy)
  carrier = jnp.where(scored, 0, carrier)
  faceoff = jnp.where(scored, 90, faceoff)

  frame = state.frame + 1
  done = frame >= CLOCK_FRAMES
  new_state = IceHockeyState(px, py, ex, ey, puck_x, puck_y, puck_vx,
                             puck_vy, carrier, frame, faceoff, key)
  return new_state, reward, done, jnp.zeros((), jnp.bool_)


def ice_hockey_render(state: IceHockeyState) -> jax.Array:
  bg = (14, 22, 48)
  rink = render.rect_mask(TOP, BOTTOM, LEFT, RIGHT)
  top_goal = render.rect_mask(TOP - 6, TOP, GOAL_X0, GOAL_X1)
  bot_goal = render.rect_mask(BOTTOM, BOTTOM + 6, GOAL_X0, GOAL_X1)
  center = render.rect_mask((TOP + BOTTOM) / 2 - 1, (TOP + BOTTOM) / 2 + 1,
                            LEFT, RIGHT)
  player = render.rect_mask(state.py, state.py + P_H,
                            state.px, state.px + P_W)
  enemy = render.rect_mask(state.ey, state.ey + P_H,
                           state.ex, state.ex + P_W)
  puck = render.rect_mask(state.puck_y, state.puck_y + PUCK,
                          state.puck_x, state.puck_x + PUCK)
  return render.compose(
      bg,
      (rink, (214, 214, 214)),
      (center, (120, 128, 160)),
      (top_goal, (180, 60, 60)),
      (bot_goal, (60, 60, 180)),
      (enemy, (200, 72, 72)),
      (player, (66, 114, 194)),
      (puck, (20, 20, 20)),
  )


GAME = register_game(Game(
    name="ice_hockey",
    num_actions=18,
    init=ice_hockey_init,
    step=ice_hockey_step,
    render=ice_hockey_render,
))
