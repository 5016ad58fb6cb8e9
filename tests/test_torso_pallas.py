"""Differential tests: fused Pallas torso vs the direct-conv oracle.

Values AND parameter gradients must match the reference torso math
(ref networks.py:181-204) to f32-reassociation tolerance. Runs the kernel
in interpreter mode (CPU test environment, tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_zoo_tpu.nets import torso_pallas


def _params(key):
  k1, k2, k3, kb = jax.random.split(key, 4)
  return (
      jax.random.normal(k1, (8, 8, 4, 32), jnp.float32) * 0.05,
      jax.random.normal(kb, (32,), jnp.float32) * 0.05,
      jax.random.normal(k2, (4, 4, 32, 64), jnp.float32) * 0.05,
      jax.random.normal(kb, (64,), jnp.float32) * 0.05,
      jax.random.normal(k3, (3, 3, 64, 64), jnp.float32) * 0.05,
      jax.random.normal(kb, (64,), jnp.float32) * 0.05,
  )


def test_fused_ok_gate():
  ok = jnp.zeros((64, 84, 84, 4), jnp.uint8)
  assert torso_pallas.fused_ok(ok)
  assert not torso_pallas.fused_ok(jnp.zeros((33, 84, 84, 4), jnp.uint8))
  assert not torso_pallas.fused_ok(jnp.zeros((64, 84, 84, 4), jnp.float32))
  assert not torso_pallas.fused_ok(jnp.zeros((64, 80, 80, 4), jnp.uint8))


def test_fused_forward_matches_oracle():
  key = jax.random.PRNGKey(0)
  p = _params(key)
  x = jax.random.randint(key, (32, 84, 84, 4), 0, 256, jnp.uint8)
  want = torso_pallas.torso_xla_reference(*p, x)
  got = torso_pallas.dqn_torso_fused(*p, x, True)
  assert got.shape == (32, 3136)
  np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_gradients_match_oracle():
  key = jax.random.PRNGKey(1)
  p = _params(key)
  x = jax.random.randint(key, (32, 84, 84, 4), 0, 256, jnp.uint8)

  def loss_fused(p):
    return jnp.sum(jnp.tanh(torso_pallas.dqn_torso_fused(*p, x, True)))

  def loss_oracle(p):
    return jnp.sum(jnp.tanh(torso_pallas.torso_xla_reference(*p, x)))

  g_fused = jax.grad(loss_fused)(p)
  g_oracle = jax.grad(loss_oracle)(p)
  for a, b in zip(g_fused, g_oracle):
    np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)


def test_fused_batches_are_independent():
  """Each sample's embedding depends only on its own frame stack."""
  key = jax.random.PRNGKey(2)
  p = _params(key)
  x = jax.random.randint(key, (64, 84, 84, 4), 0, 256, jnp.uint8)
  full = torso_pallas.dqn_torso_fused(*p, x, True)
  perm = jnp.concatenate([x[32:], x[:32]], axis=0)
  swapped = torso_pallas.dqn_torso_fused(*p, perm, True)
  np.testing.assert_allclose(
      swapped, jnp.concatenate([full[32:], full[:32]], axis=0),
      rtol=1e-6, atol=1e-6)
