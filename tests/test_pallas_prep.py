"""Differential test: Pallas fused prep kernel vs the reference jnp chain.

Runs the kernel in Pallas interpreter mode (CPU harness); on TPU the same
kernel compiles via Mosaic.
"""

import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu import prep
from dqn_zoo_tpu.prep.pallas_prep import (_resize_weights,
                                          pooled_frame_to_84_pallas)


def test_resize_weights_match_jax_image():
  import jax
  # applying the weight matrix to an impulse basis reproduces
  # jax.image.resize column-for-column
  src, dst = 210, 84
  w = _resize_weights(src, dst)
  x = np.eye(src, dtype=np.float32)
  want = np.asarray(jax.image.resize(x.astype(jnp.float32), (src, dst),
                                     method="linear",
                                     antialias=True))
  # resize maps axis 1 (length src) to dst: compare w against that operator
  np.testing.assert_allclose(want.T @ np.eye(src), w @ np.eye(src), atol=1e-5)


def test_kernel_matches_jnp_chain():
  rng = np.random.RandomState(0)
  f1 = rng.randint(0, 256, (3, 210, 160, 3), np.uint8)
  f2 = rng.randint(0, 256, (3, 210, 160, 3), np.uint8)
  want = np.asarray(prep.pooled_frame_to_84(jnp.asarray(f1),
                                            jnp.asarray(f2)))
  got = np.asarray(pooled_frame_to_84_pallas(jnp.asarray(f1),
                                             jnp.asarray(f2),
                                             interpret=True))
  diff = np.abs(got.astype(int) - want.astype(int))
  # identical up to ±1 rounding at float boundaries
  assert (diff <= 1).all(), (diff.max(), (diff > 1).mean())
  assert (diff == 0).mean() > 0.98


def test_kernel_zero_penult_padding_case():
  rng = np.random.RandomState(1)
  f2 = rng.randint(0, 256, (2, 210, 160, 3), np.uint8)
  zeros = np.zeros_like(f2)
  want = np.asarray(prep.pooled_frame_to_84(jnp.asarray(zeros),
                                            jnp.asarray(f2)))
  got = np.asarray(pooled_frame_to_84_pallas(jnp.asarray(zeros),
                                             jnp.asarray(f2),
                                             interpret=True))
  assert (np.abs(got.astype(int) - want.astype(int)) <= 1).all()
