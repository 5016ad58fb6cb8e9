"""Runs the prioritized agent (ref dqn_zoo/prioritized/run_atari.py equivalent)."""

import sys

from absl import app

from dqn_zoo_tpu.run import train


def main():
  sys.argv.insert(1, "--agent=prioritized")
  app.run(train.main)


if __name__ == "__main__":
  main()
