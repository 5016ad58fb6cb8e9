"""Fused DQN-torso forward as a lane-packed Pallas kernel + custom VJP.

The torso (ref /root/reference/dqn_zoo/networks.py:181-204: uint8/255 →
conv 32×8×8/4 → 64×4×4/2 → 64×3×3/1, ReLU each, flatten) has 32/64 output
channels — a quarter/half of the MXU's 128 lanes — so XLA's conv lowering
runs it at 15-20% MXU utilization (measured, tools/profile_conv2.py).

This kernel packs MULTIPLE OUTPUT POSITIONS into the lane dimension so
every matmul has N = 128:

  * conv1: 4 output columns × 32 ch per dot (K = 2·5·64 = 640 taps of the
    space-to-depth input), 100 dots/row-tile;
  * conv2: 2 output columns × 64 ch (K = 4 rows · 6 cols · 32 = 768);
  * conv3: 2 output columns × 64 ch (K = 3 rows · 4 cols · 64 = 768).

The packed weights are block-sparse embeddings of the dense params (built
per call in XLA — a few KB), so real/issued MACs ≈ 40-60% vs the 15-20%
XLA achieves, and all three layers chain inside one kernel. On the
forward-only (acting/eval/target) path the conv1/conv2 activations live in
VMEM scratch and are never written to HBM; under differentiation the VJP's
fwd rule switches to a variant that materializes them as kernel outputs
(~80KB/sample) for the backward pass.

Layout: y-major, batch-in-sublanes, (x, channel)-packed lanes — tensors are
(H, B, W·C), so window rows are dynamic indexes on an UNTILED dim and window
columns are static 64/128-aligned lane slices. No sublane relayouts anywhere
(Mosaic relayouts measured 10× the matmul cost in nets/iqn_head.py).

Backward: the kernel additionally writes the conv1/conv2 activations; the
custom VJP consumes them with hand-written XLA transposed convs in
space-to-depth (stride-1) form — the same ops autodiff emits for the s2d
torso, with zero forward recompute.

Numerics: identical dot products as the XLA conv, reassociated (f32
accumulation) — differential-tested against nets.core in
tests/test_torso_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dqn_zoo_tpu.nets.core import space_to_depth, weight_to_depth

_TB = 32  # batch rows per grid step (uint8 sublane tile)


def fused_ok(x) -> bool:
  return (x.ndim == 4 and x.shape[1:] == (84, 84, 4)
          and x.shape[0] % _TB == 0 and x.dtype == jnp.uint8)


def _assert_fused_ok(x) -> None:
  """Fail loudly on a forced fused path: the grid floors B/32 (trailing rows
  would silently stay uninitialized) and the kernel casts via int32 (non-u8
  inputs would silently truncate)."""
  if not fused_ok(x):
    raise ValueError(
        "dqn_torso_fused requires uint8 input of shape (B, 84, 84, 4) with "
        f"B % {_TB} == 0; got {x.dtype} {x.shape}.")


# --- packed-weight construction (XLA, tiny) ---------------------------------


def _wb1(w):
  """(8,8,4,32) → (640, 128): K = (row i∈2, col xw∈5, s2d-ch zc∈64),
  lanes = (out-col px∈4, n∈32); Wb[i, xw, zc, px, n] = w2d[i, xw−px, zc, n]."""
  w2 = weight_to_depth(w, 4)  # (2, 2, 64, 32)
  wb = jnp.zeros((2, 5, 64, 4, 32), w.dtype)
  for px in range(4):
    for j in range(2):
      wb = wb.at[:, px + j, :, px, :].set(w2[:, j])
  return wb.reshape(640, 128)


def _wb2(w):
  """(4,4,32,64) → (768, 128): K = (i∈4, xr∈6, c∈32), lanes (px∈2, n∈64);
  output col 2·obx+px reads cols 2px+j of the 6-col window."""
  wb = jnp.zeros((4, 6, 32, 2, 64), w.dtype)
  for px in range(2):
    for j in range(4):
      wb = wb.at[:, 2 * px + j, :, px, :].set(w[:, j])
  return wb.reshape(768, 128)


def _wb3(w):
  """(3,3,64,64) → (768, 128): K = (i∈3, xr∈4, c∈64), lanes (px∈2, n∈64)."""
  wb = jnp.zeros((3, 4, 64, 2, 64), w.dtype)
  for px in range(2):
    for j in range(3):
      wb = wb.at[:, px + j, :, px, :].set(w[:, j])
  return wb.reshape(768, 128)


def _pack_x(x):
  """(B,84,84,4) uint8 → (21, B, 1344): s2d-by-4, y-major, lanes (x∈21, 64)."""
  b = x.shape[0]
  z = x.reshape(b, 21, 4, 21, 4, 4).transpose(0, 1, 3, 2, 4, 5)
  return z.reshape(b, 21, 1344).transpose(1, 0, 2)


# --- kernel ------------------------------------------------------------------


def _kernel(z_ref, wb1_ref, b1_ref, wb2_ref, b2_ref, wb3_ref, b3_ref,
            z1_ref, z2_ref, out_ref):
  scale = jnp.float32(1.0 / 255.0)

  def dot(p, w_ref, b_ref):
    y = jnp.dot(p, w_ref[:], preferred_element_type=jnp.float32)
    return jax.nn.relu(y + b_ref[:])

  def conv1_row(oy, _):
    # Mosaic has no direct uint8->f32 cast; widen via int32 first.
    r0 = z_ref[oy].astype(jnp.int32).astype(jnp.float32) * scale
    r1 = z_ref[oy + 1].astype(jnp.int32).astype(jnp.float32) * scale
    for obx in range(5):
      p = jnp.concatenate(
          [r0[:, 256 * obx:256 * obx + 320], r1[:, 256 * obx:256 * obx + 320]],
          axis=1)
      z1_ref[oy, :, 128 * obx:128 * (obx + 1)] = dot(p, wb1_ref, b1_ref)
    z1_ref[oy, :, 640:704] = jnp.zeros((z_ref.shape[1], 64), jnp.float32)
    return 0

  jax.lax.fori_loop(0, 20, conv1_row, 0, unroll=False)

  def conv2_row(oy, _):
    rows = [z1_ref[2 * oy + i] for i in range(4)]
    for obx in range(5):
      p = jnp.concatenate(
          [r[:, 128 * obx:128 * obx + 192] for r in rows], axis=1)
      z2_ref[oy, :, 128 * obx:128 * (obx + 1)] = dot(p, wb2_ref, b2_ref)
    return 0

  jax.lax.fori_loop(0, 9, conv2_row, 0, unroll=False)

  def conv3_row(oy, _):
    rows = [z2_ref[oy + i] for i in range(3)]
    for obx in range(4):
      p = jnp.concatenate(
          [r[:, 128 * obx:128 * obx + 256] for r in rows], axis=1)
      y = dot(p, wb3_ref, b3_ref)
      if obx < 3:
        out_ref[oy, :, 128 * obx:128 * (obx + 1)] = y
      else:  # output col 7 does not exist: keep only col 6 (lanes 0:64)
        out_ref[oy, :, 384:448] = y[:, :64]
    return 0

  jax.lax.fori_loop(0, 7, conv3_row, 0, unroll=False)


def _kernel_fwd_only(z_ref, wb1_ref, b1_ref, wb2_ref, b2_ref, wb3_ref,
                     b3_ref, out_ref, z1_ref, z2_ref):
  """Same math as _kernel, but z1/z2 are VMEM scratch (never hit HBM)."""
  _kernel(z_ref, wb1_ref, b1_ref, wb2_ref, b2_ref, wb3_ref, b3_ref,
          z1_ref, z2_ref, out_ref)


def _fwd_call(w1, b1, w2, b2, w3, b3, x, interpret, with_residuals=True):
  _assert_fused_ok(x)
  bsz = x.shape[0]
  z = _pack_x(x)
  args = (z, _wb1(w1), jnp.tile(b1, 4).reshape(1, 128),
          _wb2(w2), jnp.tile(b2, 2).reshape(1, 128),
          _wb3(w3), jnp.tile(b3, 2).reshape(1, 128))

  full = lambda shape: pl.BlockSpec(
      shape, lambda ib: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

  in_specs = [
      pl.BlockSpec((21, _TB, 1344), lambda ib: (0, ib, 0),
                   memory_space=pltpu.VMEM),
      full((640, 128)), full((1, 128)),
      full((768, 128)), full((1, 128)),
      full((768, 128)), full((1, 128)),
  ]
  out_spec = pl.BlockSpec((7, _TB, 448), lambda ib: (0, ib, 0),
                          memory_space=pltpu.VMEM)
  out_sds = jax.ShapeDtypeStruct((7, bsz, 448), jnp.float32)

  if not with_residuals:
    out = pl.pallas_call(
        _kernel_fwd_only,
        grid=(bsz // _TB,),
        in_specs=in_specs,
        out_specs=[out_spec],
        out_shape=[out_sds],
        scratch_shapes=[
            pltpu.VMEM((20, _TB, 704), jnp.float32),
            pltpu.VMEM((9, _TB, 640), jnp.float32),
        ],
        interpret=interpret,
    )(*args)[0]
    return out.transpose(1, 0, 2).reshape(bsz, 3136), None, None

  z1, z2, out = pl.pallas_call(
      _kernel,
      grid=(bsz // _TB,),
      in_specs=in_specs,
      out_specs=[
          pl.BlockSpec((20, _TB, 704), lambda ib: (0, ib, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((9, _TB, 640), lambda ib: (0, ib, 0),
                       memory_space=pltpu.VMEM),
          out_spec,
      ],
      out_shape=[
          jax.ShapeDtypeStruct((20, bsz, 704), jnp.float32),
          jax.ShapeDtypeStruct((9, bsz, 640), jnp.float32),
          out_sds,
      ],
      interpret=interpret,
  )(*args)
  flat = out.transpose(1, 0, 2).reshape(bsz, 3136)
  z1v = z1.transpose(1, 0, 2)[:, :, :640].reshape(bsz, 20, 20, 32)
  z2v = z2.transpose(1, 0, 2)[:, :, :576].reshape(bsz, 9, 9, 64)
  return flat, z1v, z2v


# --- XLA transposed convs for the backward pass ------------------------------


def _conv(x, w):
  return jax.lax.conv_general_dilated(
      x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _wgrad(xin, dy):
  """dw (kh,kw,C,N) of a stride-1 VALID conv: contraction over batch+space."""
  out = jax.lax.conv_general_dilated(
      xin.transpose(3, 1, 2, 0), dy.transpose(1, 2, 0, 3), (1, 1), "VALID",
      dimension_numbers=("NHWC", "HWIO", "NHWC"))
  return out.transpose(1, 2, 0, 3)


def _dgrad(dy, w):
  """dx of a stride-1 VALID conv: full correlation with the flipped kernel."""
  kh, kw = w.shape[:2]
  wt = w[::-1, ::-1].transpose(0, 1, 3, 2)
  return jax.lax.conv_general_dilated(
      dy, wt, (1, 1), [(kh - 1, kh - 1), (kw - 1, kw - 1)],
      dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _inv_s2d(y, b):
  bsz, h, w, bc = y.shape
  c = bc // (b * b)
  y = y.reshape(bsz, h, w, b, b, c).transpose(0, 1, 3, 2, 4, 5)
  return y.reshape(bsz, h * b, w * b, c)


def _inv_w2d(wg, b):
  k1, k2, bc, n = wg.shape
  c = bc // (b * b)
  wg = wg.reshape(k1, k2, b, b, c, n).transpose(0, 2, 1, 3, 4, 5)
  return wg.reshape(k1 * b, k2 * b, c, n)


# --- custom-vjp op ------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def dqn_torso_fused(w1, b1, w2, b2, w3, b3, x, interpret=False):
  """flat (B, 3136) embedding from uint8 frames (B, 84, 84, 4).

  Same params and same math as the nets.core sequential torso
  (±f32 reassociation); B must be a multiple of 32 (see fused_ok).

  Outside differentiation (acting/eval/target nets) this lowers to the
  forward-only kernel — conv1/conv2 activations stay in VMEM scratch. Under
  jax.grad the custom-VJP fwd rule materializes them for the backward pass.
  """
  flat, _, _ = _fwd_call(w1, b1, w2, b2, w3, b3, x, interpret,
                         with_residuals=False)
  return flat


def _fused_fwd(w1, b1, w2, b2, w3, b3, x, interpret):
  flat, z1v, z2v = _fwd_call(w1, b1, w2, b2, w3, b3, x, interpret)
  return flat, (w2, w3, x, z1v, z2v, flat)


def _fused_bwd(interpret, res, dflat):
  del interpret
  w2, w3, x, z1v, z2v, flat = res
  bsz = x.shape[0]
  h3 = flat.reshape(bsz, 7, 7, 64)
  dpre3 = dflat.reshape(bsz, 7, 7, 64) * (h3 > 0)
  dw3 = _wgrad(z2v, dpre3)
  db3 = jnp.sum(dpre3, axis=(0, 1, 2))

  dz2 = _dgrad(dpre3, w3)
  dpre2 = dz2 * (z2v > 0)
  z1s = space_to_depth(z1v, 2)
  w2s = weight_to_depth(w2, 2)
  dw2 = _inv_w2d(_wgrad(z1s, dpre2), 2)
  db2 = jnp.sum(dpre2, axis=(0, 1, 2))

  dz1 = _inv_s2d(_dgrad(dpre2, w2s), 2)
  dpre1 = dz1 * (z1v > 0)
  x2 = space_to_depth(x.astype(jnp.float32) * (1.0 / 255.0), 4)
  dw1 = _inv_w2d(_wgrad(x2, dpre1), 4)
  db1 = jnp.sum(dpre1, axis=(0, 1, 2))

  dx = np.zeros(x.shape, dtype=jax.dtypes.float0)
  return dw1, db1, dw2, db2, dw3, db3, dx


dqn_torso_fused.defvjp(_fused_fwd, _fused_bwd)


def torso_xla_reference(w1, b1, w2, b2, w3, b3, x):
  """Direct-conv oracle with the reference's exact op order
  (ref networks.py:190-203); used by the differential tests."""

  def conv(x, w, s):
    return jax.lax.conv_general_dilated(
        x, w, (s, s), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

  h = x.astype(jnp.float32) * (1.0 / 255.0)
  h = jax.nn.relu(conv(h, w1, 4) + b1)
  h = jax.nn.relu(conv(h, w2, 2) + b2)
  h = jax.nn.relu(conv(h, w3, 1) + b3)
  return h.reshape(h.shape[0], -1)
