"""Conv profiling round 2: large inner counts to amortize the ~20ms fetch.

Key comparison: full DQN-torso fwd+bwd(params) as the engine runs it
vs a space-to-depth (s2d) torso where conv1 (8x8/4) and conv2 (4x4/2)
become stride-1 convs over packed channels.

Run: nohup python tools/profile_conv2.py > /tmp/profile_conv2.log 2>&1 &
"""

import functools
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np


def force_tree(state):
  s = jax.tree_util.tree_reduce(
      lambda a, b: a + jnp.sum(jnp.abs(b.astype(jnp.float32))),
      state, jnp.zeros(()))
  return float(np.asarray(s))


def timed(fn, state, chunks=8, inner=48):
  run = jax.jit(lambda s: functools.reduce(lambda a, _: fn(a), range(inner), s))
  state = run(state)
  state = run(state)
  force_tree(state)
  times = []
  for _ in range(chunks):
    t0 = time.time()
    state = run(state)
    force_tree(state)
    times.append(time.time() - t0)
  return statistics.median(times) / inner * 1e3


B = 2048


def conv(x, w, s):
  return jax.lax.conv_general_dilated(
      x, w, window_strides=(s, s), padding="VALID",
      dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d(x, b):
  B_, H, W, C = x.shape
  x = x.reshape(B_, H // b, b, W // b, b, C)
  return x.transpose(0, 1, 3, 2, 4, 5).reshape(B_, H // b, W // b, b * b * C)


def w_s2d(w, b):
  kh, kw, C, N = w.shape
  w = w.reshape(kh // b, b, kw // b, b, C, N)
  return w.transpose(0, 2, 1, 3, 4, 5).reshape(kh // b, kw // b, b * b * C, N)


def make_params(key):
  k1, k2, k3 = jax.random.split(key, 3)
  return {
      "w1": jax.random.normal(k1, (8, 8, 4, 32), jnp.float32) * 0.05,
      "b1": jnp.zeros((32,)),
      "w2": jax.random.normal(k2, (4, 4, 32, 64), jnp.float32) * 0.05,
      "b2": jnp.zeros((64,)),
      "w3": jax.random.normal(k3, (3, 3, 64, 64), jnp.float32) * 0.05,
      "b3": jnp.zeros((64,)),
  }


def torso_base(p, x):
  h = x.astype(jnp.float32) * (1.0 / 255.0)
  h = jax.nn.relu(conv(h, p["w1"], 4) + p["b1"])
  h = jax.nn.relu(conv(h, p["w2"], 2) + p["b2"])
  h = jax.nn.relu(conv(h, p["w3"], 1) + p["b3"])
  return h.reshape(h.shape[0], -1)


def torso_s2d(p, x):
  h = x.astype(jnp.float32) * (1.0 / 255.0)
  h = jax.nn.relu(conv(s2d(h, 4), w_s2d(p["w1"], 4), 1) + p["b1"])
  h = jax.nn.relu(conv(s2d(h, 2), w_s2d(p["w2"], 2), 1) + p["b2"])
  h = jax.nn.relu(conv(h, p["w3"], 1) + p["b3"])
  return h.reshape(h.shape[0], -1)


def main():
  print("devices:", jax.devices(), flush=True)
  key = jax.random.PRNGKey(0)
  kx, kp = jax.random.split(key)
  x = jax.random.randint(kx, (B, 84, 84, 4), 0, 256, jnp.uint8)
  params = make_params(kp)
  R = {}

  a = jax.random.normal(kx, (4096, 4096), jnp.float32)
  ms = timed(lambda s: (s @ a) * (1.0 / 64.0), a, chunks=6, inner=32)
  R["anchor_tflops"] = 2 * 4096**3 / (ms * 1e-3) / 1e12
  print(f"anchor: {ms:.3f} ms -> {R['anchor_tflops']:.1f} TF/s", flush=True)

  for name, torso in [("base", torso_base), ("s2d", torso_s2d)]:
    def fwd_step(p, torso=torso):
      y = torso(p, x)
      return jax.tree_util.tree_map(
          lambda w: w * 0.9999 + 1e-7 * jnp.mean(y), p)

    ms = timed(fwd_step, params, chunks=8, inner=24)
    R[f"torso_{name}_fwd_ms"] = ms
    print(f"torso {name} fwd: {ms:.3f} ms", flush=True)

    def grad_step(p, torso=torso):
      g = jax.grad(lambda p: jnp.sum(jnp.tanh(torso(p, x))))(p)
      return jax.tree_util.tree_map(lambda w, d: w - 1e-9 * d, p, g)

    ms = timed(grad_step, params, chunks=8, inner=12)
    R[f"torso_{name}_fwdbwd_ms"] = ms
    print(f"torso {name} fwd+bwd(params): {ms:.3f} ms", flush=True)

  # per-layer fwd at high inner to pin down conv2
  x1 = jax.random.normal(kx, (B, 20, 20, 32), jnp.float32)
  x2 = jax.random.normal(kx, (B, 9, 9, 64), jnp.float32)
  layers = {
      "conv1": (x, None),
      "conv2": (x1, None),
      "conv3": (x2, None),
  }
  def mk(name):
    if name == "conv1":
      f = lambda p: conv(x.astype(jnp.float32), p["w1"], 4)
      fs = lambda p: conv(s2d(x.astype(jnp.float32), 4), w_s2d(p["w1"], 4), 1)
    elif name == "conv2":
      f = lambda p: conv(x1, p["w2"], 2)
      fs = lambda p: conv(s2d(x1, 2), w_s2d(p["w2"], 2), 1)
    else:
      f = lambda p: conv(x2, p["w3"], 1)
      fs = None
    return f, fs

  for name in layers:
    f, fs = mk(name)
    for tag, fn in [("", f), ("_s2d", fs)]:
      if fn is None:
        continue
      def step(p, fn=fn):
        y = fn(p)
        return jax.tree_util.tree_map(
            lambda w: w * 0.9999 + 1e-7 * jnp.mean(y), p)
      ms = timed(step, params, chunks=8, inner=48)
      R[f"{name}{tag}_fwd_ms"] = ms
      print(f"{name}{tag} fwd: {ms:.3f} ms", flush=True)

  print("RESULTS", R, flush=True)


if __name__ == "__main__":
  main()
