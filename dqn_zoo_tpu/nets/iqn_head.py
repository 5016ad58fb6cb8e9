"""Fused IQN per-τ head: Pallas kernels with a custom VJP.

The IQN network (ref /root/reference/dqn_zoo/networks.py:264-292) applies a
shared value head to `tau_embedding * state_embedding` for every τ sample.
At training shapes (batch 2048 × 64 τ) the naive XLA lowering materializes
three (rows, 3136) float32 tensors in HBM per apply — cos→τ-embedding,
head input, and their backward counterparts — ~1.6 GB each, making IQN
HBM-bandwidth-bound (measured ~80 ms/learn vs ~14 ms for rainbow).

This module computes the whole chain, for rows = (stream, τ) pairs with τ
minor,

    te  = relu(cos_emb @ we + be)          # (rows, D)   τ embedding
    hi  = te * s_emb[row // S]             # (rows, D)   head input
    h   = relu(hi @ wh + bh)               # (rows, H)
    q   = h @ wo + bo                      # (rows, A)

in VMEM tiles of M = TB·S rows (TB streams, TB ∈ {1,2,4,8}) so the D-wide
intermediates never touch HBM. Everything in-kernel stays 2-D: the
stream-broadcast s_emb[row // S] is an (M, 8) one-hot MATMUL against an
8-stream s_emb block (and its transpose for the ds_emb reduction) — sublane
reshapes/relayouts of (M, D) tiles cost more than the whole matmul chain
(measured 10× regression), while the expansion matmul is ~13 MFLOP.

The backward pass recomputes the intermediates per tile (recompute beats
the saved traffic here — unlike full-loss remat, which was measured slower)
and is split into two kernels to fit the ~16 MB VMEM budget:

  * weight-grad kernel: dwh, dbh       (accumulator wh-sized: 6.4 MB)
  * data-grad kernel:   dwe, dbe, ds_emb, dcos   (needs wh resident: 6.4 MB)

holding at most one wh-sized buffer plus tiles per kernel. The tiny
wo-layer grads go through plain XLA on the saved (rows, H) hidden.

Requires B and S to be multiples of 8; iqn_atari_network falls back to the
XLA path otherwise (and always on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8  # f32 sublane count: s_emb blocks hold 8 streams
_TARGET_ROWS = 256  # rows (= TB·S) per tile


def fused_shapes_ok(b: int, s: int) -> bool:
  return b % _SUB == 0 and s % _SUB == 0


def _pick_tb(s: int) -> int:
  """Streams per tile: power of two ≤ 8 with TB·S close to the target."""
  tb = _SUB
  while tb > 1 and tb * s > _TARGET_ROWS:
    tb //= 2
  return tb


def _expand_matrix(i, tb: int, s: int):
  """(M, 8) one-hot E with E[r, t] = 1 iff row r belongs to block-stream t.

  Tile i covers streams [i·TB, i·TB+TB) = rows [off, off+TB) of the 8-stream
  s_emb block (off = (i mod 8/TB)·TB), so `E @ s_emb_block` broadcasts each
  stream's embedding over its τ rows and `Eᵀ @ X` reduces over them.
  """
  m = tb * s
  off = jax.lax.rem(i, _SUB // tb) * tb
  row_stream = jax.lax.broadcasted_iota(jnp.int32, (m, _SUB), 0) // s + off
  block_stream = jax.lax.broadcasted_iota(jnp.int32, (m, _SUB), 1)
  return (row_stream == block_stream).astype(jnp.float32)


def _full(shape):
  return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                      memory_space=pltpu.VMEM)


def _rows(m, last):
  return pl.BlockSpec((m, last), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _semb_spec(tb, d):
  return pl.BlockSpec((_SUB, d), lambda i: ((i * tb) // _SUB, 0),
                      memory_space=pltpu.VMEM)


def _dot(a, b, mm=jnp.float32):
  """MXU matmul with f32 accumulation; `mm` sets the OPERAND dtype.

  mm=bfloat16 runs the multiplies at the MXU's native-bf16 rate (~2-3x the
  f32-as-multi-pass rate) while preferred_element_type keeps a float32
  accumulator — standard mixed precision: weights/grads stay f32 in HBM,
  only the in-kernel operands round. The head chain is MXU-FLOP-bound
  (rows·D·H ≈ 0.42 TFLOP/apply at training shapes ≈ the whole measured
  learn-time at the f32 rate), so this is where IQN's remaining 2x lives —
  NOT in HBM traffic, which the tiling already eliminated.
  """
  return jnp.dot(a.astype(mm), b.astype(mm),
                 preferred_element_type=jnp.float32)


def _dot_t(a, b, dims, mm=jnp.float32):
  return jax.lax.dot_general(a.astype(mm), b.astype(mm), (dims, ((), ())),
                             preferred_element_type=jnp.float32)


# --- forward ---------------------------------------------------------------


def _fwd_kernel(cos_ref, semb_ref, we_ref, be_ref, wh_ref, bh_ref, wo_ref,
                bo_ref, q_ref, h_ref, *, tb, s, mm):
  e = _expand_matrix(pl.program_id(0), tb, s)
  te = jax.nn.relu(_dot(cos_ref[:], we_ref[:], mm) + be_ref[:])
  hi = te * _dot(e, semb_ref[:])
  h = jax.nn.relu(_dot(hi, wh_ref[:], mm) + bh_ref[:])
  h_ref[:] = h
  q_ref[:] = _dot(h, wo_ref[:], mm) + bo_ref[:]


def _fwd_call(we, be, wh, bh, wo, bo, cos_emb, s_emb, interpret, mm):
  rows, l = cos_emb.shape
  b, d = s_emb.shape
  s = rows // b
  h_dim = wh.shape[1]
  a = wo.shape[1]
  tb = _pick_tb(s)
  m = tb * s
  q, h = pl.pallas_call(
      functools.partial(_fwd_kernel, tb=tb, s=s, mm=mm),
      grid=(b // tb,),
      in_specs=[
          _rows(m, l), _semb_spec(tb, d),
          _full((l, d)), _full((1, d)), _full((d, h_dim)),
          _full((1, h_dim)), _full((h_dim, a)), _full((1, a)),
      ],
      out_specs=[_rows(m, a), _rows(m, h_dim)],
      out_shape=[
          jax.ShapeDtypeStruct((rows, a), jnp.float32),
          jax.ShapeDtypeStruct((rows, h_dim), jnp.float32),
      ],
      interpret=interpret,
  )(cos_emb, s_emb, we, be.reshape(1, -1), wh, bh.reshape(1, -1), wo,
    bo.reshape(1, -1))
  return q, h


# --- backward: wh/bh grads (hi recomputed; accumulator is wh-sized) --------


def _bwd_w_kernel(cos_ref, semb_ref, dh_ref, we_ref, be_ref, dwh_ref,
                  dbh_ref, *, tb, s, mm):
  i = pl.program_id(0)
  e = _expand_matrix(i, tb, s)
  te = jax.nn.relu(_dot(cos_ref[:], we_ref[:], mm) + be_ref[:])
  hi = te * _dot(e, semb_ref[:])
  dh = dh_ref[:]
  dwh = _dot_t(hi, dh, ((0,), (0,)), mm)  # hiᵀ @ dh
  dbh = jnp.sum(dh, axis=0, keepdims=True)

  @pl.when(i == 0)
  def _():
    dwh_ref[:] = dwh
    dbh_ref[:] = dbh

  @pl.when(i > 0)
  def _():
    dwh_ref[:] += dwh
    dbh_ref[:] += dbh


def _bwd_w_call(we, be, cos_emb, s_emb, dh, interpret, mm):
  rows, l = cos_emb.shape
  b, d = s_emb.shape
  s = rows // b
  h_dim = dh.shape[-1]
  tb = _pick_tb(s)
  m = tb * s
  dwh, dbh = pl.pallas_call(
      functools.partial(_bwd_w_kernel, tb=tb, s=s, mm=mm),
      grid=(b // tb,),
      in_specs=[
          _rows(m, l), _semb_spec(tb, d), _rows(m, h_dim),
          _full((l, d)), _full((1, d)),
      ],
      out_specs=[_full((d, h_dim)), _full((1, h_dim))],
      out_shape=[
          jax.ShapeDtypeStruct((d, h_dim), jnp.float32),
          jax.ShapeDtypeStruct((1, h_dim), jnp.float32),
      ],
      interpret=interpret,
  )(cos_emb, s_emb, dh, we, be.reshape(1, -1))
  return dwh, dbh.reshape(-1)


# --- backward: we/be/s_emb/cos grads (needs wh resident) --------------------


def _bwd_d_kernel(cos_ref, semb_ref, dh_ref, we_ref, be_ref, wh_ref,
                  dwe_ref, dbe_ref, dsemb_ref, dcos_ref, *, tb, s, mm):
  i = pl.program_id(0)
  e = _expand_matrix(i, tb, s)
  te_pre = _dot(cos_ref[:], we_ref[:], mm) + be_ref[:]
  te = jax.nn.relu(te_pre)
  dhi = _dot_t(dh_ref[:], wh_ref[:], ((1,), (1,)), mm)  # dh @ whᵀ
  # Eᵀ @ (dhi·te): rows of streams outside this tile come out zero, so the
  # 8-stream dsemb block accumulates correctly over its 8/TB visiting tiles
  # (consecutive, so the block stays resident).
  dsemb = _dot_t(e, dhi * te, ((0,), (0,)))

  @pl.when(jax.lax.rem(i, _SUB // tb) == 0)
  def _():
    dsemb_ref[:] = dsemb

  @pl.when(jax.lax.rem(i, _SUB // tb) > 0)
  def _():
    dsemb_ref[:] += dsemb

  dte = jnp.where(te_pre > 0, dhi * _dot(e, semb_ref[:]), 0.0)
  dwe = _dot_t(cos_ref[:], dte, ((0,), (0,)), mm)  # cosᵀ @ dte
  dbe = jnp.sum(dte, axis=0, keepdims=True)
  dcos_ref[:] = _dot_t(dte, we_ref[:], ((1,), (1,)), mm)  # dte @ weᵀ

  @pl.when(i == 0)
  def _():
    dwe_ref[:] = dwe
    dbe_ref[:] = dbe

  @pl.when(i > 0)
  def _():
    dwe_ref[:] += dwe
    dbe_ref[:] += dbe


def _bwd_d_call(we, be, wh, cos_emb, s_emb, dh, interpret, mm):
  rows, l = cos_emb.shape
  b, d = s_emb.shape
  s = rows // b
  h_dim = dh.shape[-1]
  tb = _pick_tb(s)
  m = tb * s
  dwe, dbe, dsemb, dcos = pl.pallas_call(
      functools.partial(_bwd_d_kernel, tb=tb, s=s, mm=mm),
      grid=(b // tb,),
      in_specs=[
          _rows(m, l), _semb_spec(tb, d), _rows(m, h_dim),
          _full((l, d)), _full((1, d)), _full((d, h_dim)),
      ],
      out_specs=[
          _full((l, d)), _full((1, d)), _semb_spec(tb, d), _rows(m, l),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((l, d), jnp.float32),
          jax.ShapeDtypeStruct((1, d), jnp.float32),
          jax.ShapeDtypeStruct((b, d), jnp.float32),
          jax.ShapeDtypeStruct((rows, l), jnp.float32),
      ],
      interpret=interpret,
  )(cos_emb, s_emb, dh, we, be.reshape(1, -1), wh)
  return dwe, dbe.reshape(-1), dsemb, dcos


# --- custom-vjp op ----------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def iqn_head_fused(we, be, wh, bh, wo, bo, cos_emb, s_emb,
                   interpret=False, mm=jnp.float32):
  """q (B, S, A) from cosine τ features and the torso embedding.

  cos_emb: (B, S, latent); s_emb: (B, D), broadcast over each stream's τ
  samples. B and S must be multiples of 8 (see fused_shapes_ok). `mm` is
  the MXU operand dtype for the heavy matmuls (see _dot); accumulation and
  all stored tensors stay float32.
  """
  b, s, l = cos_emb.shape
  q, _ = _fwd_call(we, be, wh, bh, wo, bo, cos_emb.reshape(b * s, l),
                   s_emb, interpret, mm)
  return q.reshape(b, s, -1)


def _iqn_head_fwd(we, be, wh, bh, wo, bo, cos_emb, s_emb, interpret, mm):
  b, s, l = cos_emb.shape
  q, h = _fwd_call(we, be, wh, bh, wo, bo, cos_emb.reshape(b * s, l),
                   s_emb, interpret, mm)
  return q.reshape(b, s, -1), (we, be, wh, wo, cos_emb, s_emb, h)


def _iqn_head_bwd(interpret, mm, res, dq):
  we, be, wh, wo, cos_emb, s_emb, h = res
  b, s, l = cos_emb.shape
  cos2 = cos_emb.reshape(b * s, l)
  dq2 = dq.reshape(b * s, -1)
  # wo-layer grads on the saved hidden: small, XLA handles them well.
  dwo = _dot_t(h, dq2, ((0,), (0,)))
  dbo = jnp.sum(dq2, axis=0)
  dh = jnp.dot(dq2, wo.T, preferred_element_type=jnp.float32)
  dh = jnp.where(h > 0, dh, 0.0)
  dwh, dbh = _bwd_w_call(we, be, cos2, s_emb, dh, interpret, mm)
  dwe, dbe, dsemb, dcos = _bwd_d_call(we, be, wh, cos2, s_emb, dh,
                                      interpret, mm)
  return dwe, dbe, dwh, dbh, dwo, dbo, dcos.reshape(b, s, l), dsemb


iqn_head_fused.defvjp(_iqn_head_fwd, _iqn_head_bwd)


def iqn_head_xla(we, be, wh, bh, wo, bo, cos_emb, s_emb):
  """Same contract through plain XLA ops (CPU path / differential oracle)."""
  b, s, l = cos_emb.shape
  d = s_emb.shape[1]
  te = jax.nn.relu(jnp.dot(cos_emb.reshape(b * s, l), we,
                           preferred_element_type=jnp.float32) + be)
  hi = te.reshape(b, s, d) * s_emb[:, None, :]
  h = jax.nn.relu(jnp.dot(hi.reshape(b * s, d), wh,
                          preferred_element_type=jnp.float32) + bh)
  q = jnp.dot(h, wo, preferred_element_type=jnp.float32) + bo
  return q.reshape(b, s, -1)
