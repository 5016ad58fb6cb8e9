"""Vectorized environment API.

The reference wraps a host C++ emulator behind the dm_env protocol
(/root/reference/dqn_zoo/gym_atari.py:64-125). Here the primary path is
JAX-native games that run *inside* the jitted superstep: a `Game` is a triple
of pure single-env functions (init / step-one-raw-frame / render) which the
vector wrapper vmaps over thousands of env streams. A C++ batched host env
farm with the same GroupOutput contract lives in envs/cpp_bridge.py.

Frames are raw uint8 RGB at the Atari resolution (210, 160, 3); all Atari
conventions (action repeat, noop starts, life-loss, frame caps) are applied
by the wrapper, not the games.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax

FRAME_HEIGHT = 210
FRAME_WIDTH = 160


class Game(NamedTuple):
  """A single-environment game as pure functions (vmapped by the wrapper).

  init:   (key) -> state                    episode-start state
  step:   (state, action) -> (state, reward, done, life_lost)   one RAW frame
  render: (state) -> (210, 160, 3) uint8
  lives:  (state) -> int32 remaining lives (games without lives return 1)
  num_actions: ALE-style minimal action set size.
  """

  name: str
  num_actions: int
  init: Callable[[jax.Array], Any]
  step: Callable[[Any, jax.Array], Tuple[Any, jax.Array, jax.Array, jax.Array]]
  render: Callable[[Any], jax.Array]
  lives: Callable[[Any], jax.Array] = lambda state: jax.numpy.ones(
      (), jax.numpy.int32)


class GroupOutput(NamedTuple):
  """Result of one agent-step (action-repeat group) for B envs.

  Mirrors what the reference's FixedPaddedBuffer + aggregation produce per
  emitted timestep (processors.py:446-508), in batched form.
  """

  frame_penult: jax.Array  # (B, 210, 160, 3) u8 — substep-3 frame or zeros
  frame_last: jax.Array  # (B, 210, 160, 3) u8 — substep-4 frame or zeros
  reward_sum: jax.Array  # (B,) f32 — sum of raw rewards in the group
  discount_prod: jax.Array  # (B,) f32 — ∏ substep discounts (life-loss → 0)
  is_first: jax.Array  # (B,) bool — episode-initial observation
  is_last: jax.Array  # (B,) bool — episode ends at this observation
  is_truncated: jax.Array  # (B,) bool — ended by frame cap (bootstraps)
  raw_reward_sum: jax.Array  # (B,) f32 — unclipped, for score tracking
  frames_used: jax.Array  # (B,) i32 — raw frames consumed (1..4)
  lives: jax.Array  # (B,) i32


_REGISTRY = {}


def register_game(game: Game) -> Game:
  _REGISTRY[game.name] = game
  return game


def get_game(name: str) -> Game:
  # Populate registry lazily to avoid import cycles.
  from dqn_zoo_tpu.envs.games import (asterix, atlantis,  # noqa: F401
                                      assault,  # noqa: F401
                                      beam_rider,  # noqa: F401
                                      bowling, boxing,  # noqa: F401
                                      breakout, catch,  # noqa: F401
                                      crazy_climber,  # noqa: F401
                                      demon_attack,  # noqa: F401
                                      enduro,  # noqa: F401
                                      fishing_derby, freeway,  # noqa: F401
                                      gopher,  # noqa: F401
                                      ice_hockey,  # noqa: F401
                                      ms_pacman, phoenix, pong,  # noqa: F401
                                      qbert, seaquest,  # noqa: F401
                                      skiing, star_gunner,  # noqa: F401
                                      tennis,  # noqa: F401
                                      space_invaders,  # noqa: F401
                                      zaxxon)  # noqa: F401
  if name not in _REGISTRY:
    from dqn_zoo_tpu.run.atari_data import ATARI_GAMES
    if name in ATARI_GAMES:
      raise KeyError(
          f"{name!r} is an Atari-57 cartridge without a JAX-native "
          f"implementation yet; JAX-native: {sorted(_REGISTRY)}. The full "
          "cartridge runs on the C++ farm's ALE backend: build with "
          "`make -C cpp ale` and set DZ_ENV_LIB=libdz_env_ale.so "
          "DZ_ALE_ROM_DIR=<roms> (envs/cpp_bridge.py).")
    raise KeyError(f"Unknown game {name!r}; have {sorted(_REGISTRY)}")
  return _REGISTRY[name]


def available_games() -> tuple:
  """Names with a JAX-native implementation (the reference registers all 57
  cartridge names, gym_atari.py:37-61; name-level parity lives in
  run/atari_data.ATARI_GAMES + the ALE farm hook)."""
  try:
    get_game("")  # populate the lazy registry
  except KeyError:
    pass
  return tuple(sorted(_REGISTRY))
