"""Window-gather tests: pad/unpad roundtrip, XLA↔Pallas differential.

The Pallas DMA kernel runs in interpreter mode on CPU (same kernel code the
TPU path compiles); the XLA path is the portable reference — mirrors the
reference's differential-testing strategy (replay_test.py:1048-1163)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_zoo_tpu.replay import device_replay as dr
from dqn_zoo_tpu.replay import window_gather as wg


def test_pad_unpad_roundtrip():
  x = jax.random.randint(jax.random.PRNGKey(0), (3, 84, 84), 0, 255,
                         jnp.int32).astype(jnp.uint8)
  rows = wg.pad_frames(x)
  assert rows.shape == (3, 64, 128)
  np.testing.assert_array_equal(np.asarray(wg.unpad_frames(rows, 84)),
                                np.asarray(x))


def test_row_shape_alignment():
  for f in (6, 42, 84, 96):
    rh, rw = wg.row_shape(f)
    assert rw == 128
    assert rh % 32 == 0
    assert rh * rw >= f * f


@pytest.mark.parametrize("window", [5, 7])
def test_pallas_matches_xla(window):
  key = jax.random.PRNGKey(1)
  s, c = 4, 32
  frames = jax.random.randint(key, (s, c + window, 32, 128), 0, 255,
                              jnp.int32).astype(jnp.uint8)
  b = 37  # deliberately not a multiple of the program count
  stream = jax.random.randint(jax.random.fold_in(key, 1), (b,), 0, s)
  start = jax.random.randint(jax.random.fold_in(key, 2), (b,), 0, c)
  want = wg.gather_windows_xla(frames, stream, start, window)
  got = wg.gather_windows_pallas(frames, stream, start, window,
                                 interpret=True)
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_replay_sample_with_pallas_interpret_matches_xla():
  """End-to-end: replay_sample with the Pallas gather (interpret) must
  produce identical batches to the XLA gather."""
  import dataclasses
  cfg = dr.ReplayConfig(num_streams=2, slots_per_stream=16, n_step=3,
                        stack_size=4, frame_size=6)
  cfg_p = dataclasses.replace(cfg, use_pallas_gather=True,
                              pallas_interpret=True)
  state = dr.replay_init(cfg)
  key = jax.random.PRNGKey(0)
  for t in range(24):
    key, k = jax.random.split(key)
    frame = jax.random.randint(k, (2, 6, 6), 0, 255, jnp.int32).astype(
        jnp.uint8)
    state = dr.replay_insert(
        cfg, state,
        frame=frame,
        stack_count=jnp.minimum(jnp.full((2,), t + 1, jnp.int32), 4),
        action=jnp.zeros((2,), jnp.int32),
        reward=jnp.ones((2,), jnp.float32),
        discount=jnp.full((2,), 0.99, jnp.float32),
        is_terminal=jnp.zeros((2,), jnp.bool_),
    )
  b1, l1, w1 = dr.replay_sample(cfg, state, jax.random.PRNGKey(5), 16)
  b2, l2, w2 = dr.replay_sample(cfg_p, state, jax.random.PRNGKey(5), 16)
  np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
  np.testing.assert_array_equal(np.asarray(b1.s_tm1), np.asarray(b2.s_tm1))
  np.testing.assert_array_equal(np.asarray(b1.s_t), np.asarray(b2.s_t))
