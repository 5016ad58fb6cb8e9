"""dm_env.Environment adapter over a single JAX game instance.

Capability parity with the reference's GymAtari + RandomNoopsEnvironmentWrapper
(gym_atari.py:64-216): observations are `(rgb HWC uint8, lives int32)`
tuples, episodes apply 1..max_noops random no-op frames at start, explicit
FIRST handling, raw (unskipped) frames — so the reference's host-side agent
stack (dqn_zoo_tpu.parts) runs against it unchanged. One env per adapter;
this is the compatibility/eval path, not the TPU throughput path
(envs.vector is that).
"""

from __future__ import annotations

from typing import Optional

import dm_env
from dm_env import specs
import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu.envs.api import FRAME_HEIGHT, FRAME_WIDTH, Game, get_game


class JaxGameEnvironment(dm_env.Environment):
  """Single-instance dm_env view of a Game, stepping one RAW frame at a time."""

  def __init__(self, game: Game | str, seed: int = 0, max_noops: int = 30,
               noop_action: int = 0):
    self._game = get_game(game) if isinstance(game, str) else game
    self._rng = jax.random.PRNGKey(seed)
    self._max_noops = max_noops
    self._noop_action = noop_action
    self._state = None
    self._start_of_episode = True
    # jitted single-step/render/init for dispatch economy
    self._jit_step = jax.jit(self._game.step)
    self._jit_render = jax.jit(self._game.render)
    self._jit_init = jax.jit(self._game.init)

  def _observation(self):
    rgb = np.asarray(self._jit_render(self._state))
    lives = np.int32(np.asarray(self._game.lives(self._state)))
    return (rgb, lives)

  def reset(self) -> dm_env.TimeStep:
    self._rng, init_key, noop_key = jax.random.split(self._rng, 3)
    self._state = self._jit_init(init_key)
    if self._max_noops > 0:
      n = int(jax.random.randint(noop_key, (), 1, self._max_noops + 1))
      for _ in range(n):
        self._state, _, done, _ = self._jit_step(
            self._state, jnp.asarray(self._noop_action))
        if bool(done):
          raise RuntimeError("Episode ended during noop starts "
                             "(ref gym_atari.py:198-205 raises too).")
    self._start_of_episode = False
    return dm_env.restart(self._observation())

  def step(self, action) -> dm_env.TimeStep:
    if self._state is None or self._start_of_episode:
      return self.reset()
    self._state, reward, done, life_lost = self._jit_step(
        self._state, jnp.asarray(int(action)))
    del life_lost  # exposed via the lives observation, like the reference
    obs = self._observation()
    if bool(done):
      self._start_of_episode = True
      return dm_env.termination(float(reward), obs)
    return dm_env.transition(float(reward), obs)

  def observation_spec(self):
    return (
        specs.Array(shape=(FRAME_HEIGHT, FRAME_WIDTH, 3), dtype=np.uint8,
                    name="rgb"),
        specs.Array(shape=(), dtype=np.int32, name="lives"),
    )

  def action_spec(self):
    return specs.DiscreteArray(num_values=self._game.num_actions,
                               dtype=np.int32, name="action")
