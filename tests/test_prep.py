"""Preprocessing tests.

Differential against NumPy/PIL implementations of the reference semantics
(processors.py: rgb2y:367-371, resize:374-387, stacking:489-505), plus a
golden self-hash guarding against silent drift — the reference pins its
pipeline the same way (processors_test.py:405-476).
"""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from dqn_zoo_tpu import prep


def random_frame(seed, h=210, w=160):
  return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


def test_rgb_to_y_matches_reference_truncation():
  frame = random_frame(0)
  got = np.asarray(prep.rgb_to_y(jnp.asarray(frame)))
  want = np.tensordot(frame, [0.299, 0.587, 1 - (0.299 + 0.587)],
                      (-1, 0)).astype(np.uint8)
  # float32 vs float64 rounding at the truncation boundary may differ by 1
  diff = np.abs(got.astype(int) - want.astype(int))
  assert (diff <= 1).mean() == 1.0
  assert (diff == 0).mean() > 0.99


def test_resize_close_to_pil_bilinear():
  frame = random_frame(1)
  gray = np.tensordot(frame, [0.299, 0.587, 0.114], (-1, 0)).astype(np.uint8)
  pil = np.array(
      Image.fromarray(gray).resize((84, 84), Image.Resampling.BILINEAR),
      dtype=np.uint8)
  got = np.asarray(prep.resize_bilinear(jnp.asarray(gray)))
  diff = np.abs(got.astype(int) - pil.astype(int))
  # Antialiased linear resize: not bit-exact with PIL's incremental filter,
  # but must be close everywhere (the learning signal is preserved).
  assert diff.mean() < 2.0, diff.mean()
  assert (diff <= 6).mean() > 0.995, ((diff > 6).mean(), diff.max())


def test_resize_on_smooth_image_is_tight():
  y, x = np.mgrid[0:210, 0:160]
  smooth = ((y + x) % 256).astype(np.uint8)
  pil = np.array(
      Image.fromarray(smooth).resize((84, 84), Image.Resampling.BILINEAR),
      dtype=np.uint8)
  got = np.asarray(prep.resize_bilinear(jnp.asarray(smooth)))
  assert np.abs(got.astype(int) - pil.astype(int)).max() <= 2


def test_pooled_frame_max_semantics():
  a, b = random_frame(2), random_frame(3)
  got = np.asarray(prep.pooled_frame_to_84(jnp.asarray(a), jnp.asarray(b)))
  pooled = np.maximum(a, b)
  want_gray = np.tensordot(pooled, [0.299, 0.587, 0.114], (-1, 0))
  assert got.shape == (84, 84)
  # zero penult frame = identity on the other frame
  got_single = np.asarray(
      prep.pooled_frame_to_84(jnp.zeros_like(jnp.asarray(a)), jnp.asarray(b)))
  want_single = np.asarray(
      prep.pooled_frame_to_84(jnp.asarray(b), jnp.asarray(b)))
  np.testing.assert_array_equal(got_single, want_single)


def test_aggregate_rewards_and_discounts():
  r = jnp.asarray([[0.0, 2.0, 0.0, 0.5], [0.0, -3.0, 0.0, 0.0]])
  np.testing.assert_allclose(prep.aggregate_rewards(r), [1.0, -1.0])
  d = jnp.asarray([[1.0, 1.0, 1.0, 1.0], [1.0, 0.0, 1.0, 1.0]])
  np.testing.assert_allclose(prep.aggregate_discounts(d), [0.99, 0.0])


def test_frame_stack_exact_reference_semantics():
  """Deque(4) + trailing zero pad: A000, AB00, ABC0, ABCD, BCDE, ..."""
  b = 2
  state = prep.frame_stack_init(b, size=4)
  frames = [np.full((b, 4, 4), i + 1, np.uint8) for i in range(6)]
  is_first = [True, False, False, False, False, False]

  expected_stacks = [
      [1, 0, 0, 0],
      [1, 2, 0, 0],
      [1, 2, 3, 0],
      [1, 2, 3, 4],
      [2, 3, 4, 5],
      [3, 4, 5, 6],
  ]
  for i, (f, first) in enumerate(zip(frames, is_first)):
    state = prep.frame_stack_update(
        state, jnp.asarray(f), jnp.full((b,), first))
    got = np.asarray(state.frames[0, 0, 0, :])
    np.testing.assert_array_equal(got, expected_stacks[i], f"step {i}")

  # reset mid-stream: FIRST zeroes the stack
  state = prep.frame_stack_update(
      state, jnp.asarray(frames[0]), jnp.asarray([True, False]))
  np.testing.assert_array_equal(np.asarray(state.frames[0, 0, 0, :]),
                                [1, 0, 0, 0])
  np.testing.assert_array_equal(np.asarray(state.frames[1, 0, 0, :]),
                                [4, 5, 6, 1])


def test_golden_pipeline_hash():
  """Pins the full observation pipeline against silent behavior drift."""
  rng = np.random.RandomState(42)
  f1 = rng.randint(0, 256, (210, 160, 3), np.uint8)
  f2 = rng.randint(0, 256, (210, 160, 3), np.uint8)
  obs = np.asarray(prep.pooled_frame_to_84(jnp.asarray(f1), jnp.asarray(f2)))
  digest = hashlib.sha256(obs.tobytes()).hexdigest()
  # If this changes, the preprocessing semantics changed: investigate before
  # updating the constant (mirrors processors_test.py:465-476).
  assert digest == GOLDEN_DIGEST, digest


GOLDEN_DIGEST = (
    "5461261c4edff070b3e46f5bd759cb8ce157830d4b75563959080fdde533dcad")
