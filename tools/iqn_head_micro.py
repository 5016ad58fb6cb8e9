"""Fused IQN head microbenchmark on the real TPU.

Isolates the head kernel from the rest of the superstep to find where
IQN's learn time actually goes: times forward and forward+backward of
iqn_head_fused at the training shape (rows = 2048 x 64 tau) for f32 vs
bf16 MXU operands, against the padded-FLOPs/65 TFLOP/s prediction. The
full-loop A/B measured bf16 a no-op (tools/iqn_bf16_tpu.py) — this tells
us whether the kernel is MXU-bound at all.

Runs BOTH dtypes in one process (different programs, chained inputs, so
the axon result cache cannot short-circuit; CLAUDE.md bench rules).
Usage: nohup python tools/iqn_head_micro.py > /tmp/iqn_micro.log 2>&1 &
"""

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp


B, S, L, D, H, A = 2048, 64, 64, 3136, 512, 6


def bench(fn, args, reps=8):
  out = fn(*args)
  jax.block_until_ready(out)
  # Chain a perturbation through cos_emb so inputs differ per call.
  cos = args[6]
  for _ in range(3):
    out = fn(*args)
  jax.block_until_ready(out)
  times = []
  for i in range(reps):
    args = args[:6] + (cos + 1e-6 * (i + 1),) + args[7:]
    t0 = time.perf_counter()
    out = fn(*args)
    s = jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32)), out, 0.0)
    float(jax.device_get(s))  # host fetch fence
    times.append(time.perf_counter() - t0)
  return statistics.median(times)


def main():
  from dqn_zoo_tpu.nets import iqn_head
  k = jax.random.PRNGKey(0)
  ks = jax.random.split(k, 8)
  sc = 0.05
  args = (
      jax.random.normal(ks[0], (L, D)) * sc,
      jax.random.normal(ks[1], (D,)) * sc,
      jax.random.normal(ks[2], (D, H)) * sc,
      jax.random.normal(ks[3], (H,)) * sc,
      jax.random.normal(ks[4], (H, A)) * sc,
      jax.random.normal(ks[5], (A,)) * sc,
      jax.random.normal(ks[6], (B, S, L)),
      jax.nn.relu(jax.random.normal(ks[7], (B, D))),
  )
  rows = B * S
  fwd_flops = rows * (L * D + D * H + H * A) * 2
  for mm, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
    f = jax.jit(lambda *a, _mm=mm: iqn_head.iqn_head_fused(*a, mm=_mm))
    dt = bench(f, args)
    print(json.dumps({"path": f"fwd_{name}", "ms": round(dt * 1e3, 3),
                      "tflops": round(fwd_flops / dt / 1e12, 1)}),
          flush=True)

    def loss(*a, _mm=mm):
      return jnp.sum(iqn_head.iqn_head_fused(*a, mm=_mm) ** 2)

    g = jax.jit(jax.grad(loss, argnums=tuple(range(8))))
    dt = bench(g, args)
    print(json.dumps({"path": f"fwdbwd_{name}", "ms": round(dt * 1e3, 3),
                      "tflops": round(3 * fwd_flops / dt / 1e12, 1)}),
          flush=True)
  # XLA oracle for scale.
  fx = jax.jit(iqn_head.iqn_head_xla)
  dt = bench(fx, args)
  print(json.dumps({"path": "fwd_xla_f32", "ms": round(dt * 1e3, 3),
                    "tflops": round(fwd_flops / dt / 1e12, 1)}), flush=True)


if __name__ == "__main__":
  sys.path.insert(0, ".")
  main()
