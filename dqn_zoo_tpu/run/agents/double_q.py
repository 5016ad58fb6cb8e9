"""Runs the double_q agent (ref dqn_zoo/double_q/run_atari.py equivalent)."""

import sys

from absl import app

from dqn_zoo_tpu.run import train


def main():
  sys.argv.insert(1, "--agent=double_q")
  app.run(train.main)


if __name__ == "__main__":
  main()
