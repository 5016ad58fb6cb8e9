"""ctypes bridge to the C++ batched env farm (cpp/libdz_env.so).

The native analogue of the reference's ALE dependency (gym_atari.py:26-61):
a thread-pooled farm of C++ game instances that performs the whole Atari
host protocol (action repeat, max-pool, grayscale+resize to 84×84, noop
starts, life-loss discount, frame-cap truncation, auto-reset) and hands the
device upload-ready uint8 observations. Used by engine/host_env.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import NamedTuple

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "cpp")
# DZ_ENV_LIB selects an alternative farm build — e.g. libdz_env_ale.so
# (`make -C cpp ale`) for the full-57-cartridge ALE backend.
_SO_PATH = os.path.abspath(
    os.path.join(_CPP_DIR, os.environ.get("DZ_ENV_LIB", "libdz_env.so")))


class HostGroupOutput(NamedTuple):
  obs84: np.ndarray  # (B, 84, 84) uint8 (pooled+gray+resized)
  reward_sum: np.ndarray  # (B,) f32 raw group sum
  discount_prod: np.ndarray  # (B,) f32
  is_first: np.ndarray  # (B,) bool
  is_last: np.ndarray  # (B,) bool
  is_truncated: np.ndarray  # (B,) bool
  lives: np.ndarray  # (B,) i32
  frames_used: np.ndarray  # (B,) i32


def _load_library() -> ctypes.CDLL:
  if not os.path.exists(_SO_PATH):
    subprocess.run(["make", "-C", os.path.abspath(_CPP_DIR)], check=True,
                   capture_output=True)
  lib = ctypes.CDLL(_SO_PATH)
  lib.dz_create.restype = ctypes.c_void_p
  lib.dz_create.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64,
                            ctypes.c_int, ctypes.c_int, ctypes.c_int,
                            ctypes.c_int]
  lib.dz_destroy.argtypes = [ctypes.c_void_p]
  lib.dz_num_actions.argtypes = [ctypes.c_void_p]
  lib.dz_num_actions.restype = ctypes.c_int
  lib.dz_step.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 7
  return lib


_LIB = None


def get_lib() -> ctypes.CDLL:
  global _LIB
  if _LIB is None:
    _LIB = _load_library()
  return _LIB


class CppVectorEnv:
  """Batched host env with the same agent-step contract as envs.vector."""

  def __init__(self, game: str, batch_size: int, seed: int = 0,
               num_threads: int = 0, max_noops: int = 30,
               action_repeat: int = 4, episode_frame_cap: int = 108_000):
    lib = get_lib()
    self._lib = lib
    self.batch_size = batch_size
    self._handle = lib.dz_create(game.encode(), batch_size, seed,
                                 num_threads, max_noops, action_repeat,
                                 episode_frame_cap)
    if not self._handle:
      raise ValueError(f"unknown game {game!r}")
    self.num_actions = lib.dz_num_actions(self._handle)
    b = batch_size
    self._obs = np.empty((b, 84, 84), np.uint8)
    self._rewards = np.empty((b,), np.float32)
    self._discounts = np.empty((b,), np.float32)
    self._flags = np.empty((b,), np.uint8)
    self._lives = np.empty((b,), np.int32)
    self._frames = np.empty((b,), np.int32)

  def step(self, actions: np.ndarray) -> HostGroupOutput:
    actions = np.ascontiguousarray(actions, np.int32)
    assert actions.shape == (self.batch_size,)
    c = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    self._lib.dz_step(self._handle, c(actions), c(self._obs),
                      c(self._rewards), c(self._discounts), c(self._flags),
                      c(self._lives), c(self._frames))
    flags = self._flags
    return HostGroupOutput(
        obs84=self._obs,
        reward_sum=self._rewards,
        discount_prod=self._discounts,
        is_first=(flags & 1).astype(bool),
        is_last=(flags & 2).astype(bool),
        is_truncated=(flags & 4).astype(bool),
        lives=self._lives.copy(),
        frames_used=self._frames.copy(),
    )

  def close(self) -> None:
    if self._handle:
      self._lib.dz_destroy(self._handle)
      self._handle = None

  def __del__(self):
    try:
      self.close()
    except Exception:
      pass
