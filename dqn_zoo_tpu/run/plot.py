"""Learning-curve plots from results CSVs.

Capability parity with the reference's dqn_zoo_plots.ipynb: per-game curves
and a median human-normalized summary across runs, consuming the 13-field
results.csv contract written by run/train.py.

Usage:
  python -m dqn_zoo_tpu.run.plot --csv run1.csv --csv run2.csv \
      --labels dqn,rainbow --out summary.svg

Summary mode (the plot_atari_summary.svg analogue, ref README.md:28-30):
  python -m dqn_zoo_tpu.run.plot --summary \
      --csv rainbow_pong.csv --csv rainbow_breakout.csv --csv dqn_pong.csv \
      --labels rainbow,rainbow,dqn --out summary.svg
groups the CSVs by agent label and plots each agent's MEDIAN
capped-human-normalized return across its games, interpolated onto a
common frame grid.
"""

from __future__ import annotations

import argparse
import csv
import sys


def read_results(path):
  with open(path) as f:
    rows = list(csv.DictReader(f))
  return rows


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument("--csv", action="append", required=True)
  p.add_argument("--labels", default="")
  p.add_argument("--metric", default="eval_episode_return",
                 choices=["eval_episode_return", "train_episode_return",
                          "normalized_return", "capped_normalized_return"])
  p.add_argument("--out", default="curves.svg")
  p.add_argument("--summary", action="store_true",
                 help="median capped-normalized return per agent label "
                      "across its CSVs (games), vs frames")
  args = p.parse_args(argv)

  import matplotlib
  matplotlib.use("Agg")
  import matplotlib.pyplot as plt

  labels = args.labels.split(",") if args.labels else [
      f"run{i}" for i in range(len(args.csv))]

  if args.summary:
    import numpy as np
    by_agent = {}
    for path, label in zip(args.csv, labels):
      by_agent.setdefault(label, []).append(read_results(path))
    fig, ax = plt.subplots(figsize=(8, 5))
    for agent, runs in by_agent.items():
      # Common grid up to the SHORTEST run so the median is over all games.
      horizon = min(float(r[-1]["frame"]) for r in runs)
      grid = np.linspace(0, horizon, 64)
      curves = []
      for rows in runs:
        f = np.asarray([float(r["frame"]) for r in rows])
        v = np.asarray([float(r["capped_normalized_return"]) for r in rows])
        keep = np.isfinite(v)
        curves.append(np.interp(grid, f[keep], v[keep]))
      ax.plot(grid, np.median(np.stack(curves), axis=0),
              label=f"{agent} ({len(runs)} game{'s' if len(runs)>1 else ''})")
    ax.set_xlabel("environment frames")
    ax.set_ylabel("median capped human-normalized return")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out)
    print(f"wrote {args.out}")
    return 0

  fig, ax = plt.subplots(figsize=(8, 5))
  for path, label in zip(args.csv, labels):
    rows = read_results(path)
    frames = [float(r["frame"]) for r in rows]
    vals = [float(r[args.metric]) for r in rows]
    ax.plot(frames, vals, label=label)
  ax.set_xlabel("environment frames")
  ax.set_ylabel(args.metric)
  ax.legend()
  ax.grid(alpha=0.3)
  fig.tight_layout()
  fig.savefig(args.out)
  print(f"wrote {args.out}")
  return 0


if __name__ == "__main__":
  sys.exit(main())
