"""Act/learn overlap A/B on the real TPU (RESULTS.md roadmap 3,
VERDICT r4 #5).

Times the full rainbow training superstep at the bench config (B=256) with
the default insert→learn ordering vs overlap_env_learn=True (learn samples
the pre-insert replay so the env/prep subgraph is schedulable inside the
learn block — engine/superstep.py). Bounded upside ≈ the 1.7 ms
env+prep+insert block against the ~16 ms superstep (~10%).

One config per process (CLAUDE.md): pass `base` or `overlap`.
Usage: nohup python tools/ab_overlap_tpu.py overlap > /tmp/ovl.log 2>&1 &
"""

import dataclasses
import json
import sys

import jax


def main():
  variant = sys.argv[1] if len(sys.argv) > 1 else "base"
  from dqn_zoo_tpu.engine.superstep import Engine
  from dqn_zoo_tpu.run.train import build_engine
  from tools.profile_agents import time_engine

  b = 256
  eng = build_engine("rainbow", "pong", b, replay_capacity=b * 256,
                     num_iterations=200, num_train_frames=10**6)
  if variant == "overlap":
    eng = Engine(dataclasses.replace(eng.config, overlap_env_learn=True))
  rate, per_ss = time_engine(eng)
  print(json.dumps({"agent": "rainbow", "variant": variant,
                    "env_steps_per_s": round(rate, 1),
                    "ms_per_superstep": round(per_ss * 1e3, 3)}),
        flush=True)


if __name__ == "__main__":
  sys.path.insert(0, ".")
  main()
