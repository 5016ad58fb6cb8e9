"""Bit-exact PIL resample on the device path (SURVEY hard-part #4).

The reference guards PIL-resize drift with a sha256 golden hash
(ref processors_test.py:465-476). Here the device resize has a "pil" mode
that reproduces Pillow's fixed-point resample exactly, so the golden below
is CROSS-IMPLEMENTATION: the same constant is asserted against both Pillow
itself and the jitted device kernel.
"""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from dqn_zoo_tpu import prep
from dqn_zoo_tpu.prep.pil_resize import pil_bilinear_coeffs, resize_pil_exact


@pytest.mark.parametrize("hw", [(210, 160), (100, 84), (84, 84), (64, 128),
                                (37, 53), (250, 160)])
def test_bit_exact_vs_pillow(hw):
  h, w = hw
  rng = np.random.RandomState(h * 1000 + w)
  for _ in range(3):
    img = rng.randint(0, 256, (h, w), np.uint8)
    want = np.asarray(
        Image.fromarray(img).resize((84, 84), Image.Resampling.BILINEAR))
    got = np.asarray(resize_pil_exact(jnp.asarray(img)))
    np.testing.assert_array_equal(want, got)


def test_bit_exact_batched_jitted():
  rng = np.random.RandomState(7)
  imgs = rng.randint(0, 256, (5, 210, 160), np.uint8)
  got = np.asarray(jax.jit(resize_pil_exact)(jnp.asarray(imgs)))
  for i in range(5):
    want = np.asarray(
        Image.fromarray(imgs[i]).resize((84, 84), Image.Resampling.BILINEAR))
    np.testing.assert_array_equal(want, got[i])


def test_coeff_rows_sum_to_unity_fixed_point():
  """Pillow's normalized rows quantize to ~2^22; clip8 then maps a constant
  image to itself (no DC gain)."""
  for in_size in (160, 210, 84, 64):
    k = pil_bilinear_coeffs(in_size, 84)
    sums = k.sum(axis=1)
    assert np.all(np.abs(sums - (1 << 22)) <= 4), (in_size, sums)
  const = np.full((210, 160), 137, np.uint8)
  out = np.asarray(resize_pil_exact(jnp.asarray(const)))
  np.testing.assert_array_equal(out, np.full((84, 84), 137, np.uint8))


def test_pipeline_pil_mode_matches_host_processor():
  """pooled_frame_to_84(..., resize_method='pil') == max-pool → rgb2y →
  Pillow resize, elementwise — the exact reference pipeline
  (ref processors.py:374-387)."""
  rng = np.random.RandomState(3)
  f1 = rng.randint(0, 256, (4, 210, 160, 3), np.uint8)
  f2 = rng.randint(0, 256, (4, 210, 160, 3), np.uint8)
  got = np.asarray(prep.pooled_frame_to_84(
      jnp.asarray(f1), jnp.asarray(f2), resize_method="pil"))
  pooled = np.maximum(f1, f2)
  # Same luma source as the device path (rgb_to_y's f32 rounding can differ
  # from a host reimplementation by 1 ulp at integer boundaries); the claim
  # under test is the RESIZE stage's bit-exactness with Pillow.
  gray = np.asarray(prep.rgb_to_y(jnp.asarray(pooled)))
  for i in range(4):
    want = np.asarray(Image.fromarray(gray[i]).resize(
        (84, 84), Image.Resampling.BILINEAR))
    np.testing.assert_array_equal(want, got[i])


def test_cross_implementation_golden_hash():
  """One constant, two implementations: Pillow and the device kernel must
  both hash to it (the reference's golden-pin convention made stronger)."""
  rng = np.random.RandomState(42)
  img = rng.randint(0, 256, (210, 160), np.uint8)
  via_pil = np.asarray(
      Image.fromarray(img).resize((84, 84), Image.Resampling.BILINEAR))
  via_kernel = np.asarray(resize_pil_exact(jnp.asarray(img)))
  d_pil = hashlib.sha256(via_pil.tobytes()).hexdigest()
  d_kernel = hashlib.sha256(via_kernel.tobytes()).hexdigest()
  assert d_pil == d_kernel == GOLDEN_RESIZE_DIGEST, (d_pil, d_kernel)


GOLDEN_RESIZE_DIGEST = (
    "a28154a96c0bab2071ed282033e28a42c60bf414c8842183bedc25f0dc5798eb")
