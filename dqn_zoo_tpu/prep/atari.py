"""Jitted, vectorized Atari preprocessing.

Capability parity with /root/reference/dqn_zoo/processors.py's
`processors.atari(...)` pipeline (annotated trace at processors.py:446-452),
restructured for lockstep vectorized execution on TPU:

  reference (host, per env, per frame)         here (device, per B envs,
  -------------------------------------        per agent-step)
  FixedPaddedBuffer + ConditionallySubsample → the vector env's internal
                                               action-repeat loop with masked
                                               (zero-padded) post-terminal
                                               substeps
  max-pool last 2 frames                     → jnp.maximum of the two final
                                               (masked) raw frames
  rgb2y (0.299/0.587/0.114, uint8 truncate)  → rgb_to_y
  PIL bilinear resize 84×84                  → jax.image.resize(linear,
                                               antialias=True) — PIL's
                                               BILINEAR is antialiased for
                                               downscale since Pillow 2.7,
                                               jax.image matches that model
  Deque(4) + trailing_zero_pad + stack       → frame_stack_update with a
                                               per-env fill count (exact
                                               append-then-shift semantics)
  reward sum + clip ±1                       → aggregate_rewards
  discount product × 0.99                    → aggregate_discounts

All functions are shape-static and safe under jit/vmap/scan/shard_map.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

RGB2Y_WEIGHTS = (0.299, 0.587, 1.0 - (0.299 + 0.587))


def rgb_to_y(frames: jax.Array) -> jax.Array:
  """uint8 (..., H, W, 3) → uint8 (..., H, W) luma, truncating like astype."""
  w = jnp.asarray(RGB2Y_WEIGHTS, jnp.float32)
  y = jnp.tensordot(frames.astype(jnp.float32), w, axes=((-1,), (0,)))
  # Reference uses ndarray.astype(np.uint8) == truncation toward zero.
  return y.astype(jnp.uint8)


def resize_bilinear(images: jax.Array, shape=(84, 84)) -> jax.Array:
  """uint8 (..., H, W) → uint8 (..., 84, 84), antialiased bilinear."""
  batch_shape = images.shape[:-2]
  out = jax.image.resize(
      images.astype(jnp.float32),
      batch_shape + shape,
      method="linear",
      antialias=True,
  )
  return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def pooled_frame_to_84(frame_penult: jax.Array,
                       frame_last: jax.Array,
                       resize_method: str = "fast") -> jax.Array:
  """Max-pools the two final raw frames of an action-repeat group and maps to
  the 84×84 grayscale observation.

  Inputs are uint8 (..., H, W, 3); either may be all-zero (episode-boundary
  padding), reproducing the reference's zero-pad max semantics
  (processors.py:489-494).

  resize_method: "fast" → antialiased float bilinear (jax.image, within ±6 of
  PIL, the throughput default); "pil" → bit-exact Pillow fixed-point resample
  (prep/pil_resize.py) matching the reference's pinned golden hash
  (ref processors_test.py:465-476).
  """
  pooled = jnp.maximum(frame_penult, frame_last)
  if resize_method == "pil":
    from dqn_zoo_tpu.prep.pil_resize import resize_pil_exact
    return resize_pil_exact(rgb_to_y(pooled))
  return resize_bilinear(rgb_to_y(pooled))


def aggregate_rewards(group_rewards: jax.Array,
                      max_abs_reward: float = 1.0) -> jax.Array:
  """Sum over the action-repeat group then clip (processors.py:477-481)."""
  total = jnp.sum(group_rewards, axis=-1)
  return jnp.clip(total, -max_abs_reward, max_abs_reward)


def aggregate_discounts(group_discounts: jax.Array,
                        additional_discount: float = 0.99) -> jax.Array:
  """Product over the group × additional discount (processors.py:482-486)."""
  return jnp.prod(group_discounts, axis=-1) * additional_discount


class FrameStackState(NamedTuple):
  """Per-env stack of the last 4 observations, oldest-first channel order."""

  frames: jax.Array  # (B, 84, 84, 4) uint8
  count: jax.Array  # (B,) int32 — number of valid frames in the stack


def frame_stack_init(batch: int, size: int = 84,
                     stack: int = 4) -> FrameStackState:
  return FrameStackState(
      frames=jnp.zeros((batch, size, size, stack), jnp.uint8),
      count=jnp.zeros((batch,), jnp.int32),
  )


def frame_stack_update(state: FrameStackState, obs84: jax.Array,
                       is_first: jax.Array) -> FrameStackState:
  """Appends obs84 (B,84,84) to each env's stack.

  Matches the reference Deque(4)+trailing_zero_pad exactly: on FIRST the
  stack resets to [obs,0,0,0]; while count<4 the new frame is appended at
  channel `count`; once full the stack shifts left and the new frame lands at
  channel 3 (processors.py:497-505).
  """
  b, h, w, k = state.frames.shape
  frames = jnp.where(is_first[:, None, None, None],
                     jnp.zeros_like(state.frames), state.frames)
  count = jnp.where(is_first, 0, state.count)

  shifted = jnp.concatenate(
      [frames[..., 1:], jnp.zeros((b, h, w, 1), jnp.uint8)], axis=-1)
  full = count >= k
  base = jnp.where(full[:, None, None, None], shifted, frames)
  write_idx = jnp.minimum(count, k - 1)  # (B,)
  onehot = (jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
            == write_idx[:, None])  # (B, K)
  onehot = onehot[:, None, None, :]  # (B,1,1,K)
  new_frames = jnp.where(onehot, obs84[..., None], base)
  new_count = jnp.minimum(count + 1, k)
  return FrameStackState(frames=new_frames, count=new_count)
