"""The six Atari Q-network families, as pure init/apply modules.

Capability parity with /root/reference/dqn_zoo/networks.py:224-363 (rainbow,
iqn, qr, c51, double-dqn, dqn builders) but built on dqn_zoo_tpu.nets.core's
functional module system. All networks take uint8 NHWC frame stacks
(B, 84, 84, 4) and scale to [0,1] inside the torso; every builder exposes
`init(key, sample_input) -> params` and `apply(params, rng, x) -> outputs`.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.nets import core, iqn_head, torso_pallas
from dqn_zoo_tpu.nets.core import Module


class QNetworkOutputs(NamedTuple):
  q_values: jax.Array


class C51NetworkOutputs(NamedTuple):
  q_values: jax.Array
  q_logits: jax.Array


class QRNetworkOutputs(NamedTuple):
  q_values: jax.Array
  q_dist: jax.Array


class IqnInputs(NamedTuple):
  state: jax.Array  # (B, 84, 84, 4) uint8
  taus: jax.Array  # (B, n_taus) float32


class IqnOutputs(NamedTuple):
  q_values: jax.Array
  q_dist: jax.Array


def _scale_u8() -> Module:
  def init(key, x_spec):
    del key
    return {}, jax.ShapeDtypeStruct(x_spec.shape, jnp.float32)

  def apply(params, rng, x):
    del params, rng
    return x.astype(jnp.float32) * (1.0 / 255.0)

  return Module(init, apply)


def dqn_torso(*, compute_dtype=jnp.float32,
              fused: bool | None = None) -> Module:
  """uint8→[0,1], conv 32×8×8/4 → 64×4×4/2 → 64×3×3/1, ReLU each, flatten.

  Ref networks.py:181-204. VALID padding: 84→20→9→7, so the flat embedding is
  7*7*64 = 3136.

  With fused=True the apply runs as the lane-packed Pallas kernel in
  nets/torso_pallas.py — the same math at N=128 per matmul instead of the
  32/64-channel padded convs; identical params, differential-tested
  (tests/test_torso_pallas.py). Default is the XLA space-to-depth convs
  (nets/core.py conv2d): the kernel wins the isolated torso microbench but
  LOSES the full train loop on v5e (A/B with tools/bisect_torso.py,
  2026-08-20: XLA 14.7k vs fused 13.5k env-steps/s — XLA fuses the torso
  into the surrounding learn graph better than the kernel's packing
  amortizes), so it is opt-in.
  """
  compute_dtype = jnp.dtype(compute_dtype)
  if fused and compute_dtype != jnp.float32:
    raise ValueError(
        "fused=True computes in f32; it cannot honor compute_dtype="
        f"{jnp.dtype(compute_dtype).name}. Use fused=False (or f32).")
  c = lambda n, k, s: core.conv2d(n, k, s, compute_dtype=compute_dtype)
  xla = core.sequential([
      ("scale", _scale_u8()),
      ("conv1", c(32, 8, 4)),
      ("relu1", core.relu()),
      ("conv2", c(64, 4, 2)),
      ("relu2", core.relu()),
      ("conv3", c(64, 3, 1)),
      ("relu3", core.relu()),
      ("flatten", core.flatten()),
  ])

  def apply(params, rng, x):
    if fused:  # forced: invalid inputs fail loudly in _assert_fused_ok
      return torso_pallas.dqn_torso_fused(
          params["conv1"]["w"], params["conv1"]["b"],
          params["conv2"]["w"], params["conv2"]["b"],
          params["conv3"]["w"], params["conv3"]["b"], x)
    return xla.apply(params, rng, x)

  return Module(xla.init, apply)


def dqn_value_head(num_outputs: int, *, shared_bias: bool = False,
                   compute_dtype=jnp.float32) -> Module:
  """linear 512 → ReLU → linear num_outputs (ref networks.py:207-221)."""
  last = (core.linear_shared_bias(num_outputs, compute_dtype=compute_dtype)
          if shared_bias else
          core.linear(num_outputs, compute_dtype=compute_dtype))
  return core.sequential([
      ("hidden", core.linear(512, compute_dtype=compute_dtype)),
      ("relu", core.relu()),
      ("out", last),
  ])


def dqn_atari_network(num_actions: int, *, compute_dtype=jnp.float32) -> Module:
  """Classic DQN net (ref networks.py:352-363)."""
  body = core.sequential([
      ("torso", dqn_torso(compute_dtype=compute_dtype)),
      ("head", dqn_value_head(num_actions, compute_dtype=compute_dtype)),
  ])

  def apply(params, rng, x):
    return QNetworkOutputs(q_values=body.apply(params, rng, x))

  def init(key, x):
    params, _ = body.init(key, core._spec_of(x))
    return params

  return Module(init, apply)


def double_dqn_atari_network(num_actions: int, *,
                             compute_dtype=jnp.float32) -> Module:
  """DQN net with shared-bias final layer (ref networks.py:338-349)."""
  body = core.sequential([
      ("torso", dqn_torso(compute_dtype=compute_dtype)),
      ("head", dqn_value_head(num_actions, shared_bias=True,
                              compute_dtype=compute_dtype)),
  ])

  def apply(params, rng, x):
    return QNetworkOutputs(q_values=body.apply(params, rng, x))

  def init(key, x):
    params, _ = body.init(key, core._spec_of(x))
    return params

  return Module(init, apply)


def c51_atari_network(num_actions: int, support: jax.Array, *,
                      compute_dtype=jnp.float32) -> Module:
  """C51 categorical net (ref networks.py:316-335)."""
  support = jnp.asarray(support)
  assert support.ndim == 1
  num_atoms = support.shape[0]
  body = core.sequential([
      ("torso", dqn_torso(compute_dtype=compute_dtype)),
      ("head", dqn_value_head(num_actions * num_atoms,
                              compute_dtype=compute_dtype)),
  ])

  def apply(params, rng, x):
    out = body.apply(params, rng, x)
    q_logits = out.reshape(-1, num_actions, num_atoms)
    q_dist = jax.nn.softmax(q_logits)
    q_values = jnp.sum(q_dist * support[None, None, :], axis=2)
    return C51NetworkOutputs(q_values=jax.lax.stop_gradient(q_values),
                             q_logits=q_logits)

  def init(key, x):
    params, _ = body.init(key, core._spec_of(x))
    return params

  return Module(init, apply)


def qr_atari_network(num_actions: int, quantiles: jax.Array, *,
                     compute_dtype=jnp.float32) -> Module:
  """QR-DQN quantile net (ref networks.py:295-313)."""
  quantiles = jnp.asarray(quantiles)
  assert quantiles.ndim == 1
  num_quantiles = quantiles.shape[0]
  body = core.sequential([
      ("torso", dqn_torso(compute_dtype=compute_dtype)),
      ("head", dqn_value_head(num_quantiles * num_actions,
                              compute_dtype=compute_dtype)),
  ])

  def apply(params, rng, x):
    out = body.apply(params, rng, x)
    q_dist = out.reshape(-1, num_quantiles, num_actions)
    q_values = jnp.mean(q_dist, axis=1)
    return QRNetworkOutputs(q_values=jax.lax.stop_gradient(q_values),
                            q_dist=q_dist)

  def init(key, x):
    params, _ = body.init(key, core._spec_of(x))
    return params

  return Module(init, apply)


def rainbow_atari_network(num_actions: int, support: jax.Array,
                          noisy_weight_init: float, *,
                          compute_dtype=jnp.float32) -> Module:
  """Dueling noisy C51 net (ref networks.py:224-261).

  advantage stream: noisy(512)→relu→noisy(A*atoms, no bias)
  value stream:     noisy(512)→relu→noisy(atoms, no bias)
  q_logits = value + advantage − mean_a(advantage); softmax over atoms.
  """
  support = jnp.asarray(support)
  assert support.ndim == 1
  num_atoms = support.shape[0]
  torso = dqn_torso(compute_dtype=compute_dtype)
  nl = lambda n, b: core.noisy_linear(n, noisy_weight_init, with_bias=b,
                                      compute_dtype=compute_dtype)
  adv = core.sequential([
      ("hidden", nl(512, True)),
      ("relu", core.relu()),
      ("out", nl(num_actions * num_atoms, False)),
  ])
  val = core.sequential([
      ("hidden", nl(512, True)),
      ("relu", core.relu()),
      ("out", nl(num_atoms, False)),
  ])

  def apply(params, rng, x):
    if rng is None:
      raise ValueError("rainbow network requires an rng at apply time.")
    torso_key, adv_key, val_key = jax.random.split(rng, 3)
    embed = torso.apply(params["torso"], torso_key, x)
    advantage = adv.apply(params["advantage"], adv_key, embed)
    advantage = advantage.reshape(-1, num_actions, num_atoms)
    value = val.apply(params["value"], val_key, embed).reshape(-1, 1, num_atoms)
    q_logits = value + advantage - jnp.mean(advantage, axis=-2, keepdims=True)
    q_dist = jax.nn.softmax(q_logits)
    q_values = jnp.sum(q_dist * support[None, None, :], axis=2)
    return C51NetworkOutputs(q_values=jax.lax.stop_gradient(q_values),
                             q_logits=q_logits)

  def init(key, x):
    tk, ak, vk = jax.random.split(key, 3)
    torso_params, embed_spec = torso.init(tk, core._spec_of(x))
    adv_params, _ = adv.init(ak, embed_spec)
    val_params, _ = val.init(vk, embed_spec)
    return {"torso": torso_params, "advantage": adv_params,
            "value": val_params}

  return Module(init, apply)


def iqn_atari_network(num_actions: int, latent_dim: int, *,
                      compute_dtype=jnp.float32,
                      fused_head: bool | None = None,
                      head_matmul_dtype=None) -> Module:
  """Implicit quantile net (ref networks.py:264-292).

  tau embedding: cos(pi·i·tau), i=1..latent_dim → linear(state_dim) → relu;
  head input = tau_embedding * state_embedding (broadcast over samples);
  shared value head applied per tau sample; q = mean over samples.

  On TPU (or with fused_head=True) the per-τ chain runs as the fused Pallas
  op in nets/iqn_head.py, which keeps the (rows, state_dim) intermediates in
  VMEM; elsewhere the plain XLA path is used. Both paths compute the same
  f32 math (differential-tested in tests/test_iqn_head.py).
  """
  torso = dqn_torso(compute_dtype=compute_dtype)
  # state_dim for the 84x84x4 torso is 3136; inferred at init.
  head = dqn_value_head(num_actions, compute_dtype=compute_dtype)

  def _tau_embedding_raw(taus):
    pi_mult = jnp.arange(1, latent_dim + 1, dtype=jnp.float32) * math.pi
    return jnp.cos(pi_mult[None, None, :] * taus[:, :, None])

  def apply(params, rng, inputs: IqnInputs):
    state, taus = inputs.state, inputs.taus
    torso_key = rng if rng is None else jax.random.fold_in(rng, 0)
    state_embedding = torso.apply(params["torso"], torso_key, state)
    cos_emb = _tau_embedding_raw(taus)
    b, s, _ = cos_emb.shape
    use_fused = (fused_head if fused_head is not None
                 else jax.default_backend() == "tpu")
    use_fused = use_fused and iqn_head.fused_shapes_ok(b, s)
    we = params["tau_embed"]["w"]
    be = params["tau_embed"]["b"]
    hd = params["head"]
    args = (we, be, hd["hidden"]["w"], hd["hidden"]["b"], hd["out"]["w"],
            hd["out"]["b"], cos_emb, state_embedding)
    # head_matmul_dtype=bfloat16 runs the fused head's MXU operands in
    # bf16 with f32 accumulation (params/grads stay f32); the head is
    # MXU-FLOP-bound, so the operand rate is where IQN's remaining
    # learn-time lives (see nets/iqn_head._dot). None keeps full f32.
    mm = head_matmul_dtype or jnp.float32
    q_dist = (iqn_head.iqn_head_fused(*args, mm=mm) if use_fused
              else iqn_head.iqn_head_xla(*args))
    q_values = jnp.mean(q_dist, axis=1)
    return IqnOutputs(q_values=jax.lax.stop_gradient(q_values), q_dist=q_dist)

  def init(key, inputs: IqnInputs):
    tk, ek, hk_ = jax.random.split(key, 3)
    torso_params, embed_spec = torso.init(tk, core._spec_of(inputs.state))
    state_dim = embed_spec.shape[-1]
    emb = core.linear(state_dim, compute_dtype=compute_dtype)
    n_taus = jnp.shape(inputs.taus)[-1]
    emb_params, _ = emb.init(
        ek, jax.ShapeDtypeStruct((n_taus, latent_dim), jnp.float32))
    head_params, _ = head.init(
        hk_, jax.ShapeDtypeStruct((1, state_dim), jnp.float32))
    return {"torso": torso_params, "tau_embed": emb_params,
            "head": head_params}

  return Module(init, apply)
