"""Minimal functional neural-net module system for TPU-native Q-networks.

Design goals (vs the reference's Haiku use, /root/reference/dqn_zoo/networks.py):
  * pure functions over plain dict pytrees — no global module state, no
    transform machinery; `jit`/`vmap`/`grad`/`shard_map` compose trivially;
  * explicit RNG threading: `apply(params, rng, x)`, each stochastic layer
    consumes keys derived with `jax.random.fold_in` so key usage is
    deterministic regardless of surrounding control flow;
  * shape inference at init via `jax.eval_shape` — no FLOPs spent on init;
  * convolutions issued through `lax.conv_general_dilated` with NHWC/HWIO
    layouts and `preferred_element_type` so XLA tiles them onto the MXU.

Capability parity targets: the legacy ±1/√fan_in initializer for weights AND
biases (ref networks.py:58-79), VALID-padded convs (ref networks.py:82-103),
shared-bias linear (ref networks.py:120-134), and factorized-Gaussian noisy
linear layers (ref networks.py:137-178, arXiv 1706.10295).
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, NamedTuple, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

Params = Any
PRNGKey = jax.Array


class Module(NamedTuple):
  """A pair of pure functions.

  init: (key, x_spec) -> (params, y_spec)
  apply: (params, rng, x) -> y          (rng may be None for deterministic nets)
  """

  init: Callable[[PRNGKey, Any], Tuple[Params, Any]]
  apply: Callable[[Params, PRNGKey | None, Any], Any]


def _spec_of(x) -> jax.ShapeDtypeStruct:
  return jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))


def legacy_uniform_init(key: PRNGKey, shape: Sequence[int], fan_in: int,
                        dtype=jnp.float32) -> jax.Array:
  """Uniform ±1/sqrt(fan_in) — DQN's historical init for weights and biases."""
  c = 1.0 / math.sqrt(fan_in)
  return jax.random.uniform(key, tuple(shape), dtype, minval=-c, maxval=c)


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
  return (v, v) if isinstance(v, int) else tuple(v)


def space_to_depth(x: jax.Array, b: int) -> jax.Array:
  """(B,H,W,C) -> (B,H/b,W/b,b*b*C); packed channel index = (dy, dx, c)."""
  bs, h, w, c = x.shape
  x = x.reshape(bs, h // b, b, w // b, b, c)
  return x.transpose(0, 1, 3, 2, 4, 5).reshape(bs, h // b, w // b, b * b * c)


def weight_to_depth(w: jax.Array, b: int) -> jax.Array:
  """(kh,kw,C,N) -> (kh/b,kw/b,b*b*C,N) matching space_to_depth packing."""
  kh, kw, c, n = w.shape
  w = w.reshape(kh // b, b, kw // b, b, c, n)
  return w.transpose(0, 2, 1, 3, 4, 5).reshape(kh // b, kw // b, b * b * c, n)


def conv2d(num_features: int,
           kernel_shape: Union[int, Tuple[int, int]],
           stride: Union[int, Tuple[int, int]],
           *,
           compute_dtype=jnp.float32) -> Module:
  """VALID-padded NHWC conv with legacy init on weights and biases.

  Strided convs whose kernel and input are stride-divisible CAN run in
  space-to-depth form (an s×s-strided k×k conv over C channels equals a
  stride-1 (k/s)×(k/s) conv over s²·C packed channels): this wins the
  isolated torso microbench (−1.17 ms fwd+bwd at batch 2048,
  tools/profile_conv2) but LOSES ~9% end-to-end in the full training loop
  (full-loop A/B on the real chip: 16.21k env-steps/s with DZ_DISABLE_S2D=1
  vs 14.74k with s2d — the packing transposes break XLA's fusion of the
  surrounding uint8-decode/scale ops into the conv). Default OFF; opt in
  with DZ_ENABLE_S2D=1 for workloads where the conv gradient dominates.
  Params keep the reference (kh,kw,C,N) layout (ref networks.py:82-103);
  the packing is a reshape/transpose inside apply, transparent to autodiff
  and checkpoints.
  """
  kh, kw = _pair(kernel_shape)
  strides = _pair(stride)

  def init(key, x_spec):
    in_ch = x_spec.shape[-1]
    fan_in = in_ch * kh * kw
    wk, bk = jax.random.split(key)
    params = {
        "w": legacy_uniform_init(wk, (kh, kw, in_ch, num_features), fan_in),
        "b": legacy_uniform_init(bk, (num_features,), fan_in),
    }
    y_spec = jax.eval_shape(lambda p, x: apply(p, None, x), params, x_spec)
    return params, y_spec

  def apply(params, rng, x):
    del rng
    s = strides[0]
    xc = x.astype(compute_dtype)
    wc = params["w"].astype(compute_dtype)
    s2d_on = os.environ.get("DZ_ENABLE_S2D", "") == "1"
    if (s2d_on and s > 1 and strides[1] == s and kh % s == 0
        and kw % s == 0 and x.shape[1] % s == 0 and x.shape[2] % s == 0):
      xc, wc, window = space_to_depth(xc, s), weight_to_depth(wc, s), (1, 1)
    else:
      window = strides
    # Output dtype follows compute_dtype (MXU still accumulates in f32);
    # requesting preferred_element_type=f32 on a bf16 conv would break the
    # transpose rule (cotangent f32 vs bf16 operand) in jax's conv grad.
    y = jax.lax.conv_general_dilated(
        xc, wc,
        window_strides=window,
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32)
    return y + params["b"]

  return Module(init, apply)


def linear(num_outputs: int, *, with_bias: bool = True,
           compute_dtype=jnp.float32) -> Module:
  """Dense layer with legacy init; contraction over the last axis."""

  def init(key, x_spec):
    fan_in = x_spec.shape[-1]
    wk, bk = jax.random.split(key)
    params = {"w": legacy_uniform_init(wk, (fan_in, num_outputs), fan_in)}
    if with_bias:
      params["b"] = legacy_uniform_init(bk, (num_outputs,), fan_in)
    y_spec = jax.ShapeDtypeStruct(x_spec.shape[:-1] + (num_outputs,),
                                  jnp.float32)
    return params, y_spec

  def apply(params, rng, x):
    del rng
    y = jnp.dot(x.astype(compute_dtype), params["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    if with_bias:
      y = y + params["b"].astype(y.dtype)
    return y

  return Module(init, apply)


def linear_shared_bias(num_outputs: int, *,
                       compute_dtype=jnp.float32) -> Module:
  """Dense layer with a single scalar bias broadcast over all outputs.

  Used by the double-Q network's final layer (ref networks.py:120-134).
  """

  def init(key, x_spec):
    fan_in = x_spec.shape[-1]
    wk, bk = jax.random.split(key)
    params = {
        "w": legacy_uniform_init(wk, (fan_in, num_outputs), fan_in),
        "b": legacy_uniform_init(bk, (1,), fan_in),
    }
    y_spec = jax.ShapeDtypeStruct(x_spec.shape[:-1] + (num_outputs,),
                                  jnp.float32)
    return params, y_spec

  def apply(params, rng, x):
    del rng
    y = jnp.dot(x.astype(compute_dtype), params["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    return y + params["b"].astype(y.dtype)  # (1,) broadcasts over outputs.

  return Module(init, apply)


def noisy_linear(num_outputs: int, weight_init_stddev: float,
                 *, with_bias: bool = True,
                 compute_dtype=jnp.float32) -> Module:
  """Factorized-Gaussian NoisyNet layer (arXiv 1706.10295).

  Fresh noise every apply — `apply` REQUIRES an rng. Noise is
  sign(e)·sqrt(|e|) of a truncated normal on ±2, matching the reference
  (ref networks.py:142-144), broadcast over the batch dimension.
  """

  def _noise_sqrt(key, shape):
    e = jax.random.truncated_normal(key, lower=-2.0, upper=2.0, shape=shape)
    return jax.lax.stop_gradient(jnp.sign(e) * jnp.sqrt(jnp.abs(e)))

  def init(key, x_spec):
    fan_in = x_spec.shape[-1]
    keys = jax.random.split(key, 2)
    sigma0 = weight_init_stddev / math.sqrt(fan_in)
    mu = {"w": legacy_uniform_init(keys[0], (fan_in, num_outputs), fan_in)}
    sigma = {"w": jnp.full((fan_in, num_outputs), sigma0, jnp.float32),
             "b": jnp.full((num_outputs,), sigma0, jnp.float32)}
    if with_bias:
      mu["b"] = legacy_uniform_init(keys[1], (num_outputs,), fan_in)
    params = {"mu": mu, "sigma": sigma}
    y_spec = jax.ShapeDtypeStruct(x_spec.shape[:-1] + (num_outputs,),
                                  jnp.float32)
    return params, y_spec

  def apply(params, rng, x):
    if rng is None:
      raise ValueError("noisy_linear requires an rng at apply time.")
    fan_in = x.shape[-1]
    in_key, out_key = jax.random.split(rng)
    # Noise broadcast over the batch dimension (leading axes).
    eps_in = _noise_sqrt(in_key, (1,) * (x.ndim - 1) + (fan_in,))
    eps_out = _noise_sqrt(out_key, (1,) * (x.ndim - 1) + (num_outputs,))
    dot = lambda a, w: jnp.dot(a.astype(compute_dtype),
                               w.astype(compute_dtype),
                               preferred_element_type=jnp.float32)
    mu = dot(x, params["mu"]["w"])
    if with_bias:
      mu = mu + params["mu"]["b"]
    sigma = dot(eps_in * x, params["sigma"]["w"]) + params["sigma"]["b"]
    return mu + sigma * eps_out

  return Module(init, apply)


def relu() -> Module:
  def init(key, x_spec):
    del key
    return {}, jax.ShapeDtypeStruct(x_spec.shape, jnp.float32)

  def apply(params, rng, x):
    del params, rng
    return jax.nn.relu(x)

  return Module(init, apply)


def flatten() -> Module:
  """Flattens all but the leading (batch) dimension."""

  def init(key, x_spec):
    del key
    n = int(math.prod(x_spec.shape[1:]))
    return {}, jax.ShapeDtypeStruct((x_spec.shape[0], n), x_spec.dtype)

  def apply(params, rng, x):
    del params, rng
    return x.reshape(x.shape[0], -1)

  return Module(init, apply)


def sequential(named_layers: Sequence[Tuple[str, Module]]) -> Module:
  """Composes named layers; params is a dict keyed by layer name.

  The apply rng is folded per layer index so every stochastic layer sees an
  independent, deterministic key stream.
  """
  names = [n for n, _ in named_layers]
  if len(set(names)) != len(names):
    raise ValueError(f"Duplicate layer names: {names}")

  def init(key, x_spec):
    params = {}
    spec = x_spec
    for i, (name, layer) in enumerate(named_layers):
      params[name], spec = layer.init(jax.random.fold_in(key, i), spec)
    return params, spec

  def apply(params, rng, x):
    for i, (name, layer) in enumerate(named_layers):
      sub = None if rng is None else jax.random.fold_in(rng, i)
      x = layer.apply(params[name], sub, x)
    return x

  return Module(init, apply)
