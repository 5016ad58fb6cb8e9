"""Differential tests: fused Pallas IQN head vs the plain-XLA oracle.

Mirrors the reference's differential-testing strategy for device kernels
(replay_test.py:1048-1163 tests the sum tree against a naive model); here the
fused forward AND every gradient (we, be, wh, bh, wo, bo, cos_emb, s_emb)
are checked against jax.grad through the XLA path, in Pallas interpreter
mode on CPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_zoo_tpu.nets import iqn_head

D = 3136  # torso embedding width (the real IQN shape)
H = 512
L = 64


def _make(b, s, a, key):
  ks = jax.random.split(key, 8)
  sc = 0.05
  return dict(
      we=jax.random.normal(ks[0], (L, D)) * sc,
      be=jax.random.normal(ks[1], (D,)) * sc,
      wh=jax.random.normal(ks[2], (D, H)) * sc * 0.3,
      bh=jax.random.normal(ks[3], (H,)) * sc,
      wo=jax.random.normal(ks[4], (H, a)) * sc,
      bo=jax.random.normal(ks[5], (a,)) * sc,
      cos_emb=jax.random.normal(ks[6], (b, s, L)),
      s_emb=jax.nn.relu(jax.random.normal(ks[7], (b, D))),
  )


ORDER = ("we", "be", "wh", "bh", "wo", "bo", "cos_emb", "s_emb")


@pytest.mark.parametrize("b,s,a", [(8, 8, 6), (8, 64, 18), (16, 24, 4)])
def test_forward_matches_xla(b, s, a):
  assert iqn_head.fused_shapes_ok(b, s)
  args = _make(b, s, a, jax.random.PRNGKey(0))
  pos = [args[k] for k in ORDER]
  q_ref = iqn_head.iqn_head_xla(*pos)
  q_fused = iqn_head.iqn_head_fused(*pos, interpret=True)
  np.testing.assert_allclose(np.asarray(q_fused), np.asarray(q_ref),
                             rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b,s,a", [(8, 16, 6)])
def test_grads_match_xla(b, s, a):
  args = _make(b, s, a, jax.random.PRNGKey(1))
  pos = tuple(args[k] for k in ORDER)
  # Non-uniform cotangent so every grad path is exercised.
  w = jax.random.normal(jax.random.PRNGKey(2), (b, s, a))

  def loss_ref(*p):
    return jnp.sum(iqn_head.iqn_head_xla(*p) * w)

  def loss_fused(*p):
    return jnp.sum(iqn_head.iqn_head_fused(*p, interpret=True) * w)

  argnums = tuple(range(len(ORDER)))
  g_ref = jax.grad(loss_ref, argnums)(*pos)
  g_fused = jax.grad(loss_fused, argnums)(*pos)
  for name, gr, gf in zip(ORDER, g_ref, g_fused):
    np.testing.assert_allclose(
        np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4,
        err_msg=f"grad mismatch for {name}")


def test_unaligned_shapes_fall_back():
  assert not iqn_head.fused_shapes_ok(7, 8)
  assert not iqn_head.fused_shapes_ok(8, 12)
  assert iqn_head.fused_shapes_ok(2048, 128)


def test_network_uses_fused_head_consistently():
  """iqn_atari_network(fused_head=...) produces identical q_dist both ways.

  interpret mode makes the fused path runnable on CPU; the fused_head flag
  is threaded via monkeypatched default (the network auto-selects on TPU).
  """
  from dqn_zoo_tpu import nets

  net_x = nets.iqn_atari_network(6, L, fused_head=False)
  key = jax.random.PRNGKey(3)
  obs = jax.random.randint(key, (8, 84, 84, 4), 0, 255, jnp.uint8)
  taus = jax.random.uniform(jax.random.PRNGKey(4), (8, 8))
  params = net_x.init(key, nets.IqnInputs(
      jnp.zeros((1, 84, 84, 4), jnp.uint8), jnp.zeros((1, 8))))
  out_x = net_x.apply(params, key, nets.IqnInputs(obs, taus))

  fused = functools.partial(iqn_head.iqn_head_fused, interpret=True)
  net_f = nets.iqn_atari_network(6, L, fused_head=True)
  orig = iqn_head.iqn_head_fused
  try:
    iqn_head.iqn_head_fused = fused
    # atari.py resolves the symbol at call time through the module.
    import dqn_zoo_tpu.nets.atari as atari_mod
    assert atari_mod.iqn_head.iqn_head_fused is fused
    out_f = net_f.apply(params, key, nets.IqnInputs(obs, taus))
  finally:
    iqn_head.iqn_head_fused = orig
  np.testing.assert_allclose(np.asarray(out_f.q_dist),
                             np.asarray(out_x.q_dist), rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(np.asarray(out_f.q_values),
                             np.asarray(out_x.q_values), rtol=1e-5,
                             atol=1e-5)


@pytest.mark.parametrize("b,s,a", [(8, 16, 6)])
def test_bf16_matmul_close_to_f32(b, s, a):
  """head_matmul_dtype=bfloat16 keeps f32 accumulation: outputs and grads
  must track the f32 oracle within bf16 rounding (relative ~1e-2), with
  grad DIRECTIONS essentially unchanged (cosine > 0.995) — the mixed-
  precision contract the TPU default relies on."""
  args = _make(b, s, a, jax.random.PRNGKey(3))
  pos = tuple(args[k] for k in ORDER)
  w = jax.random.normal(jax.random.PRNGKey(4), (b, s, a))

  def loss(mm):
    def f(*p):
      return jnp.sum(iqn_head.iqn_head_fused(
          *p, interpret=True, mm=mm) * w)
    return f

  q32 = iqn_head.iqn_head_fused(*pos, interpret=True)
  q16 = iqn_head.iqn_head_fused(*pos, interpret=True, mm=jnp.bfloat16)
  assert q16.dtype == jnp.float32  # f32 accumulate/output
  ref_scale = float(np.abs(np.asarray(q32)).mean())
  np.testing.assert_allclose(np.asarray(q16), np.asarray(q32),
                             rtol=0.05, atol=0.05 * ref_scale)

  argnums = tuple(range(len(ORDER)))
  g32 = jax.grad(loss(jnp.float32), argnums)(*pos)
  g16 = jax.grad(loss(jnp.bfloat16), argnums)(*pos)
  for name, a32, a16 in zip(ORDER, g32, g16):
    v32 = np.asarray(a32).ravel()
    v16 = np.asarray(a16).ravel()
    cos = float(np.dot(v32, v16)
                / max(np.linalg.norm(v32) * np.linalg.norm(v16), 1e-12))
    assert cos > 0.995, f"{name}: grad cosine {cos}"
