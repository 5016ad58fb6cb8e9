"""Mask-based frame rendering helpers.

Frames are composed from axis-aligned rectangles computed with
broadcasted_iota comparisons — fully vectorizable, no scatter, so XLA fuses
rendering straight into downstream preprocessing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.envs.api import FRAME_HEIGHT, FRAME_WIDTH

_ROWS = jax.lax.broadcasted_iota(jnp.int32, (FRAME_HEIGHT, FRAME_WIDTH), 0)
_COLS = jax.lax.broadcasted_iota(jnp.int32, (FRAME_HEIGHT, FRAME_WIDTH), 1)


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
