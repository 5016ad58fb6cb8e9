"""Mask-based frame rendering helpers.

Frames are composed from axis-aligned rectangles computed with
broadcasted_iota comparisons — fully vectorizable, no scatter, so XLA fuses
rendering straight into downstream preprocessing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu.envs.api import FRAME_HEIGHT, FRAME_WIDTH

# Host constants (folded into compiled programs at trace time; no device
# allocation at import).
_ROWS = np.arange(FRAME_HEIGHT, dtype=np.int32)[:, None] + np.zeros(
    (1, FRAME_WIDTH), np.int32)
_COLS = np.arange(FRAME_WIDTH, dtype=np.int32)[None, :] + np.zeros(
    (FRAME_HEIGHT, 1), np.int32)


def rect_mask(y0, y1, x0, x1) -> jax.Array:
  """Boolean (210,160) mask of the half-open box [y0,y1) × [x0,x1).

  Coordinates may be traced scalars (floats are floored).
  """
  y0 = jnp.asarray(y0, jnp.int32) if not isinstance(y0, int) else y0
  y1 = jnp.asarray(y1, jnp.int32) if not isinstance(y1, int) else y1
  x0 = jnp.asarray(x0, jnp.int32) if not isinstance(x0, int) else x0
  x1 = jnp.asarray(x1, jnp.int32) if not isinstance(x1, int) else x1
  return (_ROWS >= y0) & (_ROWS < y1) & (_COLS >= x0) & (_COLS < x1)


def compose(background_rgb, *layers) -> jax.Array:
  """Paints (mask, rgb) layers over a constant background, later on top.

  background_rgb: length-3 tuple. layers: (mask(210,160), rgb tuple).
  Returns (210,160,3) uint8.
  """
  frame = jnp.broadcast_to(
      jnp.asarray(background_rgb, jnp.uint8),
      (FRAME_HEIGHT, FRAME_WIDTH, 3))
  for mask, rgb in layers:
    color = jnp.asarray(rgb, jnp.uint8)
    frame = jnp.where(mask[..., None], color, frame)
  return frame
