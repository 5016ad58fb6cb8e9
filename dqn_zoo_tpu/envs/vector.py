"""Vectorized env wrapper: action repeat, noop starts, truncation, auto-reset.

Folds the reference's layered host machinery into one jit-safe batched step:

  RandomNoopsEnvironmentWrapper (gym_atari.py:128-216)  → noop burn at reset
  FixedPaddedBuffer/ConditionallySubsample
      (processors.py:112-219)                           → internal 4-substep
                                                          loop with masked
                                                          post-terminal frames
  ZeroDiscountOnLifeLoss (processors.py:274-293)        → per-substep life
                                                          discount zeroing
  run_loop's max_steps_per_episode truncation
      (parts.py:115-117)                                → episode frame cap
  run_loop's reset-on-LAST                              → auto-reset emitting
                                                          a FIRST group

One `step(state, actions)` = one agent-step for all B envs = up to
`action_repeat` raw frames each. All control flow is data-dependent-free at
trace time (masked selects), so it scans/jits/shard_maps cleanly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs.api import (FRAME_HEIGHT, FRAME_WIDTH, Game,
                                  GroupOutput)


@dataclasses.dataclass(frozen=True)
class VectorEnvConfig:
  action_repeat: int = 4
  max_noops: int = 30
  noop_action: int = 0
  episode_frame_cap: int = 108_000  # raw frames (ref run_atari.py:59-61)


class VecEnvState(NamedTuple):
  game_state: object  # batched game pytree (leading dim B)
  rng: jax.Array  # (B, 2) uint32 keys
  episode_frames: jax.Array  # (B,) int32 raw frames this episode
  needs_reset: jax.Array  # (B,) bool


class VectorAtariEnv:
  """Batched game runner. All methods are pure; state is an explicit pytree."""

  def __init__(self, game: Game, batch_size: int,
               config: VectorEnvConfig = VectorEnvConfig()):
    self.game = game
    self.batch_size = batch_size
    self.config = config

  @property
  def num_actions(self) -> int:
    return self.game.num_actions

  # --- single-env logic (vmapped below) ------------------------------------

  def _reset_one(self, key):
    """New episode state after 1..max_noops noop raw frames.

    If an episode terminates DURING the burn, the state freezes at the last
    pre-done frame instead of silently stepping a finished game — the
    reference raises in that case (gym_atari.py:188-198) but inside jit we
    can't; freezing keeps the two paths behaviorally aligned for every game
    that (like the reference's cartridges) cannot finish in <30 frames,
    and is well-defined for one that somehow can.
    """
    key, k_init, k_noops = jax.random.split(key, 3)
    gs = self.game.init(k_init)
    n = jax.random.randint(k_noops, (), 1, self.config.max_noops + 1)

    def body(_, carry):
      g, done = carry
      g2, _, d2, _ = self.game.step(g, jnp.asarray(self.config.noop_action))
      # Select on done|d2 so a step that TERMINATES the episode is also
      # discarded: the kept state is genuinely the last pre-done frame and
      # a finished game is never handed to _step_one as live (round-4
      # advisor finding; only reachable for games that can end within the
      # <=30-frame burn, e.g. catch).
      keep = done | d2
      g2 = jax.tree.map(lambda a, b: jnp.where(keep, a, b), g, g2)
      return g2, keep

    gs, _ = jax.lax.fori_loop(0, n, body, (gs, jnp.zeros((), jnp.bool_)))
    return key, gs

  def _step_one(self, gs, key, ep_frames, needs_reset, action):
    zero_frame = jnp.zeros((FRAME_HEIGHT, FRAME_WIDTH, 3), jnp.uint8)

    def reset_branch(operand):
      gs, key = operand
      key2, gs2 = self._reset_one(key)
      out = GroupOutput(
          frame_penult=zero_frame,
          frame_last=self.game.render(gs2),
          reward_sum=jnp.zeros(()),
          discount_prod=jnp.ones(()),
          is_first=jnp.asarray(True),
          is_last=jnp.asarray(False),
          is_truncated=jnp.asarray(False),
          raw_reward_sum=jnp.zeros(()),
          frames_used=jnp.ones((), jnp.int32),
          lives=self.game.lives(gs2),
      )
      return gs2, key2, jnp.ones((), jnp.int32), jnp.asarray(False), out

    def step_branch(operand):
      gs0, key = operand
      gs_c = gs0
      done = jnp.asarray(False)
      reward = jnp.zeros(())
      life_disc = jnp.ones(())
      frames = jnp.zeros((), jnp.int32)
      f_pen, f_last = zero_frame, zero_frame
      for m in range(self.config.action_repeat):
        execute = ~done
        gs_n, r, d, ll = self.game.step(gs_c, action)
        gs_c = jax.tree.map(lambda a, b: jnp.where(execute, a, b), gs_n, gs_c)
        reward = reward + jnp.where(execute, r, 0.0)
        life_disc = life_disc * jnp.where(execute & ll, 0.0, 1.0)
        frames = frames + execute.astype(jnp.int32)
        if m == self.config.action_repeat - 2:
          f_pen = jnp.where(execute, self.game.render(gs_c), zero_frame)
        if m == self.config.action_repeat - 1:
          f_last = jnp.where(execute, self.game.render(gs_c), zero_frame)
        done = done | (execute & d)

      ep2 = ep_frames + frames
      truncated = ~done & (ep2 >= self.config.episode_frame_cap)
      is_last = done | truncated
      discount = life_disc * jnp.where(done, 0.0, 1.0)
      out = GroupOutput(
          frame_penult=f_pen,
          frame_last=f_last,
          reward_sum=reward,  # raw group sum; clipping happens in prep
          discount_prod=discount,
          is_first=jnp.asarray(False),
          is_last=is_last,
          is_truncated=truncated,
          raw_reward_sum=reward,
          frames_used=frames,
          lives=self.game.lives(gs_c),
      )
      return gs_c, key, ep2, is_last, out

    return jax.lax.cond(needs_reset, reset_branch, step_branch, (gs, key))

  # --- batched API ----------------------------------------------------------

  def init(self, key: jax.Array) -> VecEnvState:
    """All envs start in needs_reset so the first step emits FIRST groups."""
    keys = jax.random.split(key, self.batch_size)
    # Build a template game state to get the batched pytree structure.
    gs = jax.vmap(self.game.init)(keys)
    return VecEnvState(
        game_state=gs,
        rng=jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys),
        episode_frames=jnp.zeros((self.batch_size,), jnp.int32),
        needs_reset=jnp.ones((self.batch_size,), jnp.bool_),
    )

  def step(self, state: VecEnvState,
           actions: jax.Array) -> Tuple[VecEnvState, GroupOutput]:
    gs, key, ep, last, out = jax.vmap(self._step_one)(
        state.game_state, state.rng, state.episode_frames,
        state.needs_reset, actions)
    return VecEnvState(gs, key, ep, last), out
