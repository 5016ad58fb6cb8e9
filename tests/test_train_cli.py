"""Driver CLI smoke tests (shrunk flags) — the analogue of the reference's
per-agent run_atari_test.py files."""

import csv
import os
import subprocess
import sys

import pytest

from dqn_zoo_tpu.run.train import build_engine


def test_build_engine_parity_mode_reduces_to_reference_schedule():
  eng = build_engine("dqn", "pong", num_envs=1, replay_capacity=2048,
                     replay_ratio_mode="parity")
  # B=1: batch 32 every 4 supersteps (16 frames) — the reference schedule.
  assert eng.config.batch_size == 32
  assert eng.config.learn_every == 4
  assert eng.config.updates_per_learn == 1
  assert eng.spec.learning_rate == 0.00025  # untouched in parity mode


def test_build_engine_throughput_mode_preserves_ratio_and_scales_lr():
  eng = build_engine("dqn", "pong", num_envs=256, replay_capacity=65536)
  cfg = eng.config
  samples = cfg.batch_size * cfg.updates_per_learn / cfg.learn_every
  assert samples == 8 * 256  # 8 samples per inserted transition
  assert eng.spec.learning_rate == pytest.approx(
      0.00025 * (cfg.batch_size / 32) ** 0.5)


def test_build_engine_rainbow_n_step_replay():
  eng = build_engine("rainbow", "breakout", num_envs=8, replay_capacity=1024)
  assert eng.rcfg.n_step == 3
  assert eng.rcfg.priority_exponent == 0.5


@pytest.mark.parametrize("agent", ["dqn", "rainbow"])
def test_cli_end_to_end(tmp_path, agent):
  csv_path = str(tmp_path / "results.csv")
  env = dict(os.environ)
  env["JAX_PLATFORMS"] = "cpu"
  env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
  env["PALLAS_AXON_POOL_IPS"] = ""
  env["PYTHONPATH"] = os.pathsep.join(
      [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
      + env.get("PYTHONPATH", "").split(os.pathsep))
  code = (
      "import jax; jax.config.update('jax_platforms','cpu');"
      "from absl import app; from dqn_zoo_tpu.run import train;"
      "import sys; app.run(train.main)")
  proc = subprocess.run(
      [sys.executable, "-c", code,
       f"--agent={agent}", "--environment_name=catch", "--num_envs=4",
       "--replay_capacity=256", "--num_iterations=1",
       "--num_train_frames=800", "--num_eval_frames=400",
       "--max_frames_per_episode=1000", "--batch_size=8",
       "--eval_num_envs=4", f"--results_csv_path={csv_path}"],
      capture_output=True, text=True, env=env, timeout=540)
  assert proc.returncode == 0, proc.stderr[-3000:]
  with open(csv_path) as f:
    rows = list(csv.DictReader(f))
  assert len(rows) == 2  # iterations 0 and 1
  assert list(rows[0].keys()) == [
      "iteration", "frame", "eval_episode_return", "train_episode_return",
      "eval_num_episodes", "train_num_episodes", "eval_frame_rate",
      "train_frame_rate", "train_exploration_epsilon", "train_state_value",
      "normalized_return", "capped_normalized_return", "human_gap"]
  assert float(rows[1]["train_episode_return"]) <= 1.0


def test_cli_checkpoint_split_resume(tmp_path):
  """Two short processes with --iterations_per_run resume into one run
  (the lease-safe checkpoint-split workflow; replay excluded from the
  checkpoint via --checkpoint_replay=false)."""
  csv_path = str(tmp_path / "results.csv")
  ckpt_path = str(tmp_path / "ckpt")
  env = dict(os.environ)
  env["JAX_PLATFORMS"] = "cpu"
  env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
  env["PALLAS_AXON_POOL_IPS"] = ""
  env["PYTHONPATH"] = os.pathsep.join(
      [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
      + env.get("PYTHONPATH", "").split(os.pathsep))
  code = (
      "import jax; jax.config.update('jax_platforms','cpu');"
      "from absl import app; from dqn_zoo_tpu.run import train;"
      "import sys; app.run(train.main)")
  args = [
      sys.executable, "-c", code,
      "--agent=dqn", "--environment_name=catch", "--num_envs=4",
      "--replay_capacity=256", "--num_iterations=2",
      "--num_train_frames=400", "--num_eval_frames=200",
      "--max_frames_per_episode=1000", "--batch_size=8",
      "--eval_num_envs=4", f"--results_csv_path={csv_path}",
      f"--checkpoint_path={ckpt_path}", "--iterations_per_run=1",
      "--checkpoint_replay=false", "--checkpoint_period=1"]
  for run in range(3):  # iterations 0, 1, 2 — one per process
    proc = subprocess.run(args, capture_output=True, text=True, env=env,
                          timeout=540)
    assert proc.returncode == 0, f"run {run}: {proc.stderr[-3000:]}"
  with open(csv_path) as f:
    rows = list(csv.DictReader(f))
  assert [r["iteration"] for r in rows] == ["0", "1", "2"]
  # frames advance across processes: env_frames persisted in the checkpoint
  assert float(rows[2]["train_exploration_epsilon"]) <= float(
      rows[1]["train_exploration_epsilon"])
