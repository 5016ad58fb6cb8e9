"""IQN fused-head matmul-dtype A/B on the real TPU (VERDICT r4 #4).

The fused head's matmul chain (rows·D·H, nets/iqn_head.py) is MXU-FLOP
bound at training shapes: B=256 streams → learner rows = 2048·64 τ,
0.42 TFLOP per apply ≈ the entire measured learn time at the ~65 TFLOP/s
f32 rate. This times the full training superstep with the head's MXU
operands in f32 vs bf16 (f32 accumulation either way; grads/params f32 —
nets/iqn_head._dot).

One config per process (CLAUDE.md TPU rules): pass `f32` or `bf16`.
Usage: nohup python tools/iqn_bf16_tpu.py bf16 > /tmp/iqn_bf16.log 2>&1 &
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp


def main():
  variant = sys.argv[1] if len(sys.argv) > 1 else "f32"
  from dqn_zoo_tpu import nets
  if variant == "bf16":
    orig = nets.iqn_atari_network
    nets.iqn_atari_network = functools.partial(
        orig, head_matmul_dtype=jnp.bfloat16)
  from dqn_zoo_tpu.run.train import build_engine
  from tools.profile_agents import time_engine

  b = 256
  eng = build_engine("iqn", "pong", b, replay_capacity=b * 256,
                     num_iterations=200, num_train_frames=10**6)
  rate, per_ss = time_engine(eng)
  print(json.dumps({"agent": "iqn", "head_matmul": variant,
                    "env_steps_per_s": round(rate, 1),
                    "ms_per_superstep": round(per_ss * 1e3, 3)}),
        flush=True)


if __name__ == "__main__":
  sys.path.insert(0, ".")
  main()
