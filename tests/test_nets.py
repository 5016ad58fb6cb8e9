"""Network tests: shapes, param counts, init ranges, noisy-layer RNG contract.

Mirrors the reference's networks_test.py coverage
(/root/reference/dqn_zoo/networks_test.py): layer shapes, shared-bias param
shape/semantics, noisy-linear determinism and RNG requirement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_zoo_tpu import nets
from dqn_zoo_tpu.nets import core

A = 6  # num actions
SAMPLE = np.zeros((2, 84, 84, 4), dtype=np.uint8)


def _n_params(p):
  return sum(x.size for x in jax.tree_util.tree_leaves(p))


def test_torso_output_shape():
  torso = nets.dqn_torso()
  params, spec = torso.init(jax.random.PRNGKey(0),
                            jax.ShapeDtypeStruct((2, 84, 84, 4), jnp.uint8))
  assert spec.shape == (2, 7 * 7 * 64)
  y = torso.apply(params, None, jnp.asarray(SAMPLE))
  assert y.shape == (2, 3136)


def test_dqn_network_shapes_and_param_count():
  net = nets.dqn_atari_network(A)
  params = net.init(jax.random.PRNGKey(0), SAMPLE)
  out = net.apply(params, jax.random.PRNGKey(1), jnp.asarray(SAMPLE))
  assert out.q_values.shape == (2, A)
  # conv params + linear(3136->512) + linear(512->A)
  expected = (8 * 8 * 4 * 32 + 32) + (4 * 4 * 32 * 64 + 64) + \
      (3 * 3 * 64 * 64 + 64) + (3136 * 512 + 512) + (512 * A + A)
  assert _n_params(params) == expected


def test_double_dqn_shared_bias_shape():
  net = nets.double_dqn_atari_network(A)
  params = net.init(jax.random.PRNGKey(0), SAMPLE)
  assert params["head"]["out"]["b"].shape == (1,)
  out = net.apply(params, None, jnp.asarray(SAMPLE))
  assert out.q_values.shape == (2, A)


def test_shared_bias_semantics():
  layer = core.linear_shared_bias(5)
  params, _ = layer.init(jax.random.PRNGKey(0),
                         jax.ShapeDtypeStruct((1, 3), jnp.float32))
  x = jnp.ones((1, 3))
  y = layer.apply(params, None, x)
  expected = x @ params["w"] + params["b"][0]
  np.testing.assert_allclose(y, expected, rtol=1e-6)


def test_legacy_init_range():
  key = jax.random.PRNGKey(42)
  w = core.legacy_uniform_init(key, (1000,), fan_in=64)
  c = 1 / np.sqrt(64)
  assert np.all(np.abs(np.asarray(w)) <= c)
  assert np.std(np.asarray(w)) > 0.3 * c  # actually uniform, not collapsed


def test_c51_network():
  support = jnp.linspace(-10.0, 10.0, 51)
  net = nets.c51_atari_network(A, support)
  params = net.init(jax.random.PRNGKey(0), SAMPLE)
  out = net.apply(params, None, jnp.asarray(SAMPLE))
  assert out.q_logits.shape == (2, A, 51)
  assert out.q_values.shape == (2, A)
  probs = jax.nn.softmax(out.q_logits)
  np.testing.assert_allclose(
      out.q_values, jnp.sum(probs * support[None, None, :], axis=2), rtol=1e-5)


def test_qr_network():
  quantiles = (jnp.arange(201, dtype=jnp.float32) + 0.5) / 201
  net = nets.qr_atari_network(A, quantiles)
  params = net.init(jax.random.PRNGKey(0), SAMPLE)
  out = net.apply(params, None, jnp.asarray(SAMPLE))
  assert out.q_dist.shape == (2, 201, A)
  np.testing.assert_allclose(out.q_values, jnp.mean(out.q_dist, axis=1),
                             rtol=1e-5)


def test_rainbow_network_requires_rng_and_is_deterministic_given_rng():
  support = jnp.linspace(-10.0, 10.0, 51)
  net = nets.rainbow_atari_network(A, support, noisy_weight_init=0.1)
  params = net.init(jax.random.PRNGKey(0), SAMPLE)
  with pytest.raises(ValueError):
    net.apply(params, None, jnp.asarray(SAMPLE))
  k = jax.random.PRNGKey(7)
  out1 = net.apply(params, k, jnp.asarray(SAMPLE))
  out2 = net.apply(params, k, jnp.asarray(SAMPLE))
  np.testing.assert_array_equal(out1.q_logits, out2.q_logits)
  out3 = net.apply(params, jax.random.PRNGKey(8), jnp.asarray(SAMPLE))
  assert not np.allclose(out1.q_logits, out3.q_logits)
  assert out1.q_logits.shape == (2, A, 51)


def test_noisy_linear_param_shapes():
  layer = core.noisy_linear(7, 0.1, with_bias=True)
  params, _ = layer.init(jax.random.PRNGKey(0),
                         jax.ShapeDtypeStruct((1, 3), jnp.float32))
  assert params["mu"]["w"].shape == (3, 7)
  assert params["mu"]["b"].shape == (7,)
  assert params["sigma"]["w"].shape == (3, 7)
  assert params["sigma"]["b"].shape == (7,)
  # sigma init is the constant 0.1/sqrt(fan_in)
  np.testing.assert_allclose(params["sigma"]["w"],
                             0.1 / np.sqrt(3) * np.ones((3, 7)), rtol=1e-6)


def test_iqn_network():
  net = nets.iqn_atari_network(A, latent_dim=64)
  taus = jax.random.uniform(jax.random.PRNGKey(3), (2, 8))
  inputs = nets.IqnInputs(state=jnp.asarray(SAMPLE), taus=taus)
  params = net.init(jax.random.PRNGKey(0), inputs)
  out = net.apply(params, jax.random.PRNGKey(1), inputs)
  assert out.q_dist.shape == (2, 8, A)
  assert out.q_values.shape == (2, A)
  np.testing.assert_allclose(out.q_values, jnp.mean(out.q_dist, axis=1),
                             rtol=1e-5)


def test_networks_jit_and_vmap_compose():
  net = nets.dqn_atari_network(A)
  params = net.init(jax.random.PRNGKey(0), SAMPLE)
  f = jax.jit(lambda p, x: net.apply(p, None, x).q_values)
  q = f(params, jnp.asarray(SAMPLE))
  assert q.shape == (2, A)


def test_bfloat16_compute_grads_flow():
  """bf16 compute must be differentiable (regression: conv with
  preferred_element_type=f32 on bf16 operands breaks jax's conv transpose
  rule — 'requires arguments to have the same dtypes')."""
  net = nets.dqn_atari_network(A, compute_dtype=jnp.bfloat16)
  params = net.init(jax.random.PRNGKey(0), jnp.asarray(SAMPLE))

  def loss(p):
    out = net.apply(p, None, jnp.asarray(SAMPLE))
    return jnp.sum(out.q_values ** 2)

  grads = jax.grad(loss)(params)
  for g in jax.tree_util.tree_leaves(grads):
    assert g.dtype == jnp.float32
    assert np.isfinite(np.asarray(g)).all()


def test_bfloat16_rainbow_grads_flow():
  support = jnp.linspace(-10.0, 10.0, 51)
  net = nets.rainbow_atari_network(A, support, 0.1,
                                   compute_dtype=jnp.bfloat16)
  params = net.init(jax.random.PRNGKey(0), jnp.asarray(SAMPLE))
  rng = jax.random.PRNGKey(1)

  def loss(p):
    out = net.apply(p, rng, jnp.asarray(SAMPLE))
    return jnp.sum(out.q_values ** 2)

  grads = jax.grad(loss)(params)
  for g in jax.tree_util.tree_leaves(grads):
    assert np.isfinite(np.asarray(g)).all()


def test_space_to_depth_conv_matches_direct():
  """s2d rewrite of strided convs is the same math as the direct conv.

  conv2d lowers stride-divisible convs to stride-1 convs over packed
  channels (core.space_to_depth); this pins the equivalence against
  lax.conv on the exact DQN-torso shapes, values AND gradients.
  """
  key = jax.random.PRNGKey(7)
  for (hw, c, n, k, s) in [((84, 84), 4, 32, 8, 4), ((20, 20), 32, 64, 4, 2)]:
    kx, kw, kb, key = jax.random.split(key, 4)
    x = jax.random.normal(kx, (3, *hw, c), jnp.float32)
    w = jax.random.normal(kw, (k, k, c, n), jnp.float32) * 0.1
    b = jax.random.normal(kb, (n,), jnp.float32)
    direct = jax.lax.conv_general_dilated(
        x, w, window_strides=(s, s), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    mod = core.conv2d(n, k, s)
    y = mod.apply({"w": w, "b": b}, None, x)
    np.testing.assert_allclose(y, direct, rtol=2e-5, atol=2e-5)

    # Gradients flow through the packing transparently and match the
    # direct conv's gradients.
    def loss(params, conv_fn):
      return jnp.sum(jnp.tanh(conv_fn(params)))

    g_s2d = jax.grad(lambda p: loss(p, lambda p: mod.apply(p, None, x)))(
        {"w": w, "b": b})
    g_dir = jax.grad(lambda p: loss(p, lambda p: jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(s, s), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]))(
        {"w": w, "b": b})
    np.testing.assert_allclose(g_s2d["w"], g_dir["w"], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(g_s2d["b"], g_dir["b"], rtol=2e-4, atol=2e-4)


def test_space_to_depth_skips_nondivisible_shapes():
  """Odd input sizes fall back to the direct strided conv."""
  key = jax.random.PRNGKey(3)
  x = jax.random.normal(key, (2, 11, 11, 3), jnp.float32)
  mod = core.conv2d(5, 4, 2)
  params, _ = mod.init(key, jax.ShapeDtypeStruct(x.shape, x.dtype))
  y = mod.apply(params, None, x)
  assert y.shape == (2, 4, 4, 5)
