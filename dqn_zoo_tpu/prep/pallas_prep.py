"""Fused Pallas preprocessing kernel: max-pool + luma + 84×84 resize.

One kernel per env-frame group replaces the XLA chain
maximum → tensordot → (antialiased resize = two contractions) from
prep/atari.py. The resize is expressed as two small matmuls with
precomputed antialiased-linear weight matrices, so the MXU does the
resampling while the VPU does pooling and the luma dot:

  y84 = clip(round( Ry · rgb2y(max(f1, f2)) · Cxᵀ ))  with
  Ry (84, 210), Cx (84, 160) — separable resize weights.

Frames enter PLANAR (B, 3, 210, 160): channel-minor uint8 would waste the
128-lane dimension (3 of 128 lanes used); planar rows put the 160-pixel
axis on the lanes. The caller transposes — XLA fuses that into the frame
producer.

The weight matrices match jax.image.resize(method='linear',
antialias=True) exactly (triangle kernel, scale-dilated), so this kernel is
a drop-in for `pooled_frame_to_84` — asserted by the differential test in
tests/test_pallas_prep.py (kernel in interpreter mode on CPU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dqn_zoo_tpu.envs.api import FRAME_HEIGHT, FRAME_WIDTH

OUT = 84
_RGB_W = (0.299, 0.587, 1.0 - (0.299 + 0.587))


@functools.lru_cache(maxsize=None)
def _resize_weights(src: int, dst: int) -> np.ndarray:
  """(dst, src) antialiased linear (triangle) resampling matrix.

  Matches jax.image.resize's 'linear' kernel with antialias=True: sample
  positions at pixel centers, triangle support dilated by the scale factor,
  rows normalized to sum 1.
  """
  scale = dst / src
  out = np.zeros((dst, src), np.float32)
  inv = 1.0 / scale  # > 1 for downsampling
  for i in range(dst):
    center = (i + 0.5) * inv - 0.5
    lo = int(np.floor(center - inv))
    hi = int(np.ceil(center + inv))
    for j in range(max(lo, 0), min(hi + 1, src)):
      w = max(0.0, 1.0 - abs(j - center) * scale)
      out[i, j] = w
    s = out[i].sum()
    if s > 0:
      out[i] /= s
  return out


def _kernel(f1_ref, f2_ref, ry_ref, cx_ref, out_ref):
  # refs: f1/f2 (1, 3, H, W) u8; ry (84, H); cx (84, W); out (1, 84, 84) u8
  pooled = jnp.maximum(f1_ref[0], f2_ref[0]).astype(jnp.float32)  # (3, H, W)
  w = _RGB_W
  # luma with uint8-truncation semantics (prep/atari.py rgb_to_y)
  y = jnp.floor(pooled[0] * w[0] + pooled[1] * w[1] + pooled[2] * w[2])
  y = jnp.minimum(y, 255.0)  # (H, W)
  rows = jnp.dot(ry_ref[...], y, preferred_element_type=jnp.float32)
  out = jnp.dot(rows, cx_ref[...].T, preferred_element_type=jnp.float32)
  out_ref[0] = jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)


def pooled_frame_to_84_pallas(frame_penult: jax.Array, frame_last: jax.Array,
                              *, interpret: bool = False) -> jax.Array:
  """(B, 210, 160, 3) u8 ×2 → (B, 84, 84) u8, one fused kernel per frame."""
  b = frame_penult.shape[0]
  f1 = jnp.transpose(frame_penult, (0, 3, 1, 2))  # planar
  f2 = jnp.transpose(frame_last, (0, 3, 1, 2))
  ry = jnp.asarray(_resize_weights(FRAME_HEIGHT, OUT))
  cx = jnp.asarray(_resize_weights(FRAME_WIDTH, OUT))
  frame_spec = pl.BlockSpec((1, 3, FRAME_HEIGHT, FRAME_WIDTH),
                            lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
  return pl.pallas_call(
      _kernel,
      grid=(b,),
      in_specs=[
          frame_spec,
          frame_spec,
          pl.BlockSpec((OUT, FRAME_HEIGHT), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((OUT, FRAME_WIDTH), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, OUT, OUT), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, OUT, OUT), jnp.uint8),
      interpret=interpret,
  )(f1, f2, ry, cx)
