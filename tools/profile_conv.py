"""Per-op conv cost measurement on the real TPU (fetch-forced timing).

Measures fwd and fwd+bwd wall time for each DQN-torso conv layer
(ref networks.py:190-203 shapes) at the learn batch size, plus
space-to-depth (s2d) reformulations that turn strided convs into
stride-1 convs over packed channels. Grounds the blocked-conv
optimization targets in measured numbers (see CLAUDE.md bench rules).

Run: nohup python tools/profile_conv.py > /tmp/profile_conv.log 2>&1 &
"""

import functools
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np


def force(x):
  return float(np.asarray(x))


def timed(fn, state, chunks=10, inner=8):
  """Median time of fn chained inner times, fetch-forced per chunk."""
  run = jax.jit(lambda s: functools.reduce(lambda a, _: fn(a), range(inner), s))
  state = run(state)
  state = run(state)  # discard 2 post-compile executions
  force(jax.tree_util.tree_reduce(
      lambda a, b: a + jnp.sum(jnp.abs(b.astype(jnp.float32))),
      state, jnp.zeros(())))
  times = []
  for _ in range(chunks):
    t0 = time.time()
    state = run(state)
    force(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b.astype(jnp.float32))),
        state, jnp.zeros(())))
    times.append(time.time() - t0)
  return statistics.median(times) / inner * 1e3  # ms per call


B = 2048
CONVS = {
    # name: (in_shape HWC, w_shape HWIO, stride)
    "conv1": ((84, 84, 4), (8, 8, 4, 32), 4),
    "conv2": ((20, 20, 32), (4, 4, 32, 64), 2),
    "conv3": ((9, 9, 64), (3, 3, 64, 64), 1),
}


def conv(x, w, s):
  return jax.lax.conv_general_dilated(
      x, w, window_strides=(s, s), padding="VALID",
      dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d(x, b):
  """(B,H,W,C) -> (B,H/b,W/b,b*b*C), channel index = (dy, dx, c)."""
  B_, H, W, C = x.shape
  x = x.reshape(B_, H // b, b, W // b, b, C)
  return x.transpose(0, 1, 3, 2, 4, 5).reshape(B_, H // b, W // b, b * b * C)


def w_s2d(w, b):
  """(kh,kw,C,N) -> (kh/b, kw/b, b*b*C, N) matching s2d channel order."""
  kh, kw, C, N = w.shape
  w = w.reshape(kh // b, b, kw // b, b, C, N)
  return w.transpose(0, 2, 1, 3, 4, 5).reshape(kh // b, kw // b, b * b * C, N)


def main():
  print("devices:", jax.devices(), flush=True)
  key = jax.random.PRNGKey(0)
  results = {}

  # calibration anchor: 4096^3 f32 matmul ~= 65 TFLOP/s expected
  a = jax.random.normal(key, (4096, 4096), jnp.float32)
  ms = timed(lambda s: (s @ a) * (1.0 / 64.0), a, chunks=6, inner=4)
  results["anchor_matmul_tflops"] = 2 * 4096**3 / (ms * 1e-3) / 1e12
  print(f"anchor: {ms:.3f} ms -> {results['anchor_matmul_tflops']:.1f} TF/s",
        flush=True)

  for name, (xs, ws, s) in CONVS.items():
    kx, kw_, key = jax.random.split(key, 3)
    x = jax.random.normal(kx, (B,) + xs, jnp.float32)
    w = jax.random.normal(kw_, ws, jnp.float32) * 0.05

    # --- fwd: chain x' = normalize(pad-to-input-shape(conv(x, w))) ----------
    # Chain through w only (x static input won't chain shapes); chain w.
    def fwd_step(wc, x=x, s=s):
      y = conv(x, wc, s)
      return wc * 0.999 + 1e-6 * jnp.mean(y)  # depends on full conv

    ms = timed(fwd_step, w, chunks=8, inner=6)
    results[f"{name}_fwd_ms"] = ms
    real_macs = np.prod(conv(x[:1], w, s).shape) * np.prod(ws[:3])
    results[f"{name}_fwd_tflops"] = 2 * real_macs * B / (ms * 1e-3) / 1e12
    print(f"{name} fwd: {ms:.3f} ms  real {results[f'{name}_fwd_tflops']:.1f} TF/s",
          flush=True)

    # --- fwd+bwd wrt w and x -------------------------------------------------
    def grad_step(state, s=s):
      wc, xc = state
      def loss(wc, xc):
        return jnp.sum(jnp.tanh(conv(xc, wc, s)))
      dw, dx = jax.grad(loss, argnums=(0, 1))(wc, xc)
      return (wc - 1e-9 * dw, xc - 1e-9 * dx)

    ms = timed(grad_step, (w, x), chunks=8, inner=4)
    results[f"{name}_fwdbwd_ms"] = ms
    print(f"{name} fwd+bwd(w,x): {ms:.3f} ms", flush=True)

    # --- fwd+bwd wrt w only (conv1 case: no dgrad needed) -------------------
    def gradw_step(wc, x=x, s=s):
      def loss(wc):
        return jnp.sum(jnp.tanh(conv(x, wc, s)))
      dw = jax.grad(loss)(wc)
      return wc - 1e-9 * dw

    ms = timed(gradw_step, w, chunks=8, inner=4)
    results[f"{name}_fwdbwd_wonly_ms"] = ms
    print(f"{name} fwd+bwd(w): {ms:.3f} ms", flush=True)

    # --- s2d variant (strided convs only) ------------------------------------
    if s > 1:
      x2 = s2d(x, s)
      w2 = w_s2d(w, s)

      def s2d_fwd(wc, x2=x2):
        y = conv(x2, wc, 1)
        return wc * 0.999 + 1e-6 * jnp.mean(y)

      ms = timed(s2d_fwd, w2, chunks=8, inner=6)
      results[f"{name}_s2d_fwd_ms"] = ms
      print(f"{name} s2d fwd (pre-packed x): {ms:.3f} ms", flush=True)

      def s2d_fwd_tx(wc, x=x, s=s):
        y = conv(s2d(x, s), wc, 1)
        return wc * 0.999 + 1e-6 * jnp.mean(y)

      ms = timed(s2d_fwd_tx, w2, chunks=8, inner=6)
      results[f"{name}_s2d_fwd_inclpack_ms"] = ms
      print(f"{name} s2d fwd (incl pack): {ms:.3f} ms", flush=True)

      def s2d_grad(state):
        wc, x2c = state
        def loss(wc, x2c):
          return jnp.sum(jnp.tanh(conv(x2c, wc, 1)))
        dw, dx = jax.grad(loss, argnums=(0, 1))(wc, x2c)
        return (wc - 1e-9 * dw, x2c - 1e-9 * dx)

      ms = timed(s2d_grad, (w2, x2), chunks=8, inner=4)
      results[f"{name}_s2d_fwdbwd_ms"] = ms
      print(f"{name} s2d fwd+bwd(w,x): {ms:.3f} ms", flush=True)

      def s2d_gradw(wc, x2=x2):
        def loss(wc):
          return jnp.sum(jnp.tanh(conv(x2, wc, 1)))
        dw = jax.grad(loss)(wc)
        return wc - 1e-9 * dw

      ms = timed(s2d_gradw, w2, chunks=8, inner=4)
      results[f"{name}_s2d_fwdbwd_wonly_ms"] = ms
      print(f"{name} s2d fwd+bwd(w): {ms:.3f} ms", flush=True)

  print("RESULTS", results, flush=True)


if __name__ == "__main__":
  main()
