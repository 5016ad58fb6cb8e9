"""Bit-exact PIL BILINEAR resize as integer contractions (device-friendly).

The reference preprocessing resizes the pooled grayscale frame with
PIL: `Image.fromarray(pooled).resize((84, 84), Image.BILINEAR)`
(ref processors.py:374-387) and pins a sha256 golden hash over the result
(ref processors_test.py:465-476) — so curve parity at the bit level needs
an implementation that reproduces Pillow's resample EXACTLY, not a float
approximation.

Pillow's 8-bit resample (Pillow src/libImaging/Resample.c) is:

  1. Coefficients per output pixel are computed in double precision with the
     triangle filter over a `support = scale` window (antialiased downscale),
     normalized to sum 1, then quantized to int32 fixed point with
     PRECISION_BITS = 32 - 8 - 2 = 22 and round-half-away-from-zero.
  2. A HORIZONTAL pass producing an 8-bit intermediate image: for each output
     pixel, `clip8(2**21 + sum_k coeff[k] * pixel[k])` where
     clip8(v) = clamp(v >> 22, 0, 255) (arithmetic shift).
  3. A VERTICAL pass with the same arithmetic over the intermediate.

Because every step is integer arithmetic on int32 (max |accumulator| <
255 * 2**22 + 2**21 < 2**31), the two passes are exactly representable as
dense int32 mat-muls with the quantized coefficient matrices — shape-static,
jit/vmap-safe, and bit-identical to Pillow on every input. The matrices are
tiny ((84, H_in) and (84, W_in), ≤ ceil(scale)*2+1 non-zeros per row) and
computed once per (in_size, out_size) pair at trace time.

Exactness is asserted against Pillow itself in tests/test_pil_resize.py
(random images, multiple sizes) and the end-to-end pipeline golden hash.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

PRECISION_BITS = 32 - 8 - 2  # Resample.c: 22
_HALF = 1 << (PRECISION_BITS - 1)


@functools.lru_cache(maxsize=None)
def pil_bilinear_coeffs(in_size: int, out_size: int) -> np.ndarray:
  """Quantized Pillow coefficient matrix, shape (out_size, in_size) int32.

  Mirrors precompute_coeffs + normalize_coeffs_8bpc (Resample.c): double
  precision triangle weights over a support window, sum-normalized, then
  fixed-point quantized. Row r holds the weights of output pixel r.
  """
  scale = in_size / out_size
  filterscale = max(scale, 1.0)
  support = 1.0 * filterscale  # bilinear filter support = 1.0
  ss = 1.0 / filterscale
  out = np.zeros((out_size, in_size), np.int32)
  for xx in range(out_size):
    center = (xx + 0.5) * scale
    xmin = int(center - support + 0.5)
    if xmin < 0:
      xmin = 0
    xmax = int(center + support + 0.5)
    if xmax > in_size:
      xmax = in_size
    k = np.zeros(xmax - xmin, np.float64)
    for x in range(xmax - xmin):
      w = (x + xmin - center + 0.5) * ss
      w = abs(w)
      k[x] = (1.0 - w) if w < 1.0 else 0.0
    total = k.sum()
    if total != 0.0:
      k /= total
    # normalize_coeffs_8bpc: round half away from zero, C truncation.
    q = np.where(k < 0, -0.5 + k * (1 << PRECISION_BITS),
                 0.5 + k * (1 << PRECISION_BITS)).astype(np.int64)
    out[xx, xmin:xmax] = q.astype(np.int32)
  return out


def _clip8(acc: jax.Array) -> jax.Array:
  # clip8 (Resample.c): arithmetic shift then clamp — negatives floor to 0,
  # overflow (>= 1 << 30) saturates at 255.
  return jnp.clip(
      jax.lax.shift_right_arithmetic(acc, PRECISION_BITS), 0, 255
  ).astype(jnp.uint8)


def resize_pil_exact(images: jax.Array, shape=(84, 84)) -> jax.Array:
  """uint8 (..., H, W) → uint8 (..., out_h, out_w), bit-exact with
  `PIL.Image.fromarray(img).resize((out_w, out_h), Image.BILINEAR)`.

  Horizontal pass first, then vertical, each with an 8-bit intermediate —
  the same pass structure and rounding as Pillow's two-pass resample.
  """
  out_h, out_w = shape
  in_h, in_w = images.shape[-2], images.shape[-1]
  x = images.astype(jnp.int32)
  if in_w != out_w:
    kh = jnp.asarray(pil_bilinear_coeffs(in_w, out_w))  # (out_w, in_w)
    # (..., H, in_w) @ (in_w, out_w) — int32 exact.
    acc = jax.lax.dot_general(
        x, kh.T, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    x = _clip8(acc + _HALF).astype(jnp.int32)
  if in_h != out_h:
    kv = jnp.asarray(pil_bilinear_coeffs(in_h, out_h))  # (out_h, in_h)
    # Contract the H axis (now ndim-2): move it last, contract, move back.
    x = jnp.swapaxes(x, -1, -2)  # (..., W, H)
    acc = jax.lax.dot_general(
        x, kv.T, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # (..., W, out_h)
    x = _clip8(acc + _HALF).astype(jnp.int32)
    x = jnp.swapaxes(x, -1, -2)  # (..., out_h, W)
  return x.astype(jnp.uint8)
