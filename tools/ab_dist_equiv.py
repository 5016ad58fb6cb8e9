"""Distributed learning-equivalence A/B (VERDICT r4 #3).

Runs the SAME training twice through the real CLI at identical flags, seed
and global frame count — once on the plain single-device driver
(run/train.py) and once data-parallel over a 4-virtual-device CPU mesh
(--mesh_devices=4 → run/train_dist.py) — and compares the learning curves.
This empirically validates the frame_multiplier schedule algebra
(engine/superstep.py: global-frame schedule clocks; parallel/distributed.py)
that previously rested on unit math alone: if the distributed layer's
epsilon/IS/target-period bookkeeping were wrong in global-frame units, the
D=4 curve would visibly diverge from D=1 at equal frames.

Both legs run on XLA:CPU so the comparison is same-backend (the repo has one
real TPU chip; mesh parallelism is validated on virtual devices, see
CLAUDE.md). dqn/catch: returns in [-1, 1], learns within ~50k frames.

Usage: PALLAS_AXON_POOL_IPS= python tools/ab_dist_equiv.py
Writes results/dist_equiv_cpu.json.
"""

import csv
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FRAMES_PER_ITER = 8000
EVAL_FRAMES = 4000
ITERS = int(os.environ.get("ITERS", "12"))  # 12 → 96k train frames
SEED = 3


def run_leg(mesh_devices: int, csv_path: str) -> list:
  if os.path.exists(csv_path):
    os.unlink(csv_path)  # CsvWriter appends; stale rows would mix runs
  env = dict(os.environ)
  env["JAX_PLATFORMS"] = "cpu"
  env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
  env["PALLAS_AXON_POOL_IPS"] = ""
  env["PYTHONPATH"] = os.pathsep.join(
      [ROOT] + env.get("PYTHONPATH", "").split(os.pathsep))
  code = ("import jax; jax.config.update('jax_platforms','cpu');"
          "from absl import app; from dqn_zoo_tpu.run import train;"
          "app.run(train.main)")
  args = [
      sys.executable, "-c", code,
      "--agent=dqn", "--environment_name=catch", "--num_envs=8",
      "--replay_capacity=4096", f"--seed={SEED}",
      f"--num_iterations={ITERS}", f"--num_train_frames={FRAMES_PER_ITER}",
      f"--num_eval_frames={EVAL_FRAMES}", "--max_frames_per_episode=2000",
      "--eval_num_envs=4", f"--results_csv_path={csv_path}",
  ]
  if mesh_devices > 1:
    args.append(f"--mesh_devices={mesh_devices}")
  t0 = time.time()
  proc = subprocess.run(args, capture_output=True, text=True, env=env)
  if proc.returncode != 0:
    sys.stderr.write(proc.stderr[-4000:])
    raise SystemExit(f"leg mesh={mesh_devices} failed")
  with open(csv_path) as f:
    rows = list(csv.DictReader(f))
  print(f"mesh={mesh_devices}: {time.time()-t0:.0f}s, "
        f"{len(rows)} iterations", flush=True)
  return rows


def main():
  out_dir = os.path.join(ROOT, "results")
  d1 = run_leg(1, "/tmp/dist_equiv_d1.csv")
  d4 = run_leg(4, "/tmp/dist_equiv_d4.csv")
  curve1 = [round(float(r["eval_episode_return"]), 3) for r in d1]
  curve4 = [round(float(r["eval_episode_return"]), 3) for r in d4]
  # Final window = mean of the last two iterations' eval returns.
  f1 = sum(curve1[-2:]) / 2
  f4 = sum(curve4[-2:]) / 2
  result = {
      "config": {"agent": "dqn", "game": "catch", "num_envs_global": 8,
                 "seed": SEED, "train_frames": ITERS * FRAMES_PER_ITER,
                 "frames_per_iteration": FRAMES_PER_ITER,
                 "eval_frames_per_iteration": EVAL_FRAMES},
      "eval_return_curve_d1": curve1,
      "eval_return_curve_d4": curve4,
      "final_window_d1": round(f1, 3),
      "final_window_d4": round(f4, 3),
      "final_window_abs_diff": round(abs(f1 - f4), 3),
  }
  with open(os.path.join(out_dir, "dist_equiv_cpu.json"), "w") as f:
    json.dump(result, f, indent=1)
  print(json.dumps(result, indent=1))


if __name__ == "__main__":
  main()
