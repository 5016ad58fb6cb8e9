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


def test_spec_overrides_round_trip_into_engine():
  """Reference flag surface (dqn/run_atari.py:49-95): overrides land in the
  spec the engine (and its jitted loss/act closures) actually uses."""
  eng = build_engine(
      "c51", "pong", num_envs=4, replay_capacity=1024,
      replay_ratio_mode="parity",
      spec_overrides=dict(
          learning_rate=1e-3, optimizer_epsilon=3e-4,
          target_network_update_period=800, learn_period=8,
          exploration_epsilon_begin=0.5, exploration_epsilon_end=0.02,
          eval_exploration_epsilon=0.0, vmax=5.0, num_atoms=21))
  s = eng.spec
  assert s.learning_rate == 1e-3 and s.optimizer_epsilon == 3e-4
  assert s.target_network_update_period == 800 and s.learn_period == 8
  assert (s.exploration_epsilon_begin, s.exploration_epsilon_end) == (0.5,
                                                                      0.02)
  assert s.eval_exploration_epsilon == 0.0
  assert s.vmax == 5.0 and s.num_atoms == 21
  # learn_period override changes the derived sample ratio: 32/8 = 4
  # samples per frame -> 4*B*4 per superstep.
  cfg = eng.config
  assert cfg.batch_size * cfg.updates_per_learn / cfg.learn_every == 4 * 4 * 4
  # the overridden net-shape params reach the network: 21 atoms per action.
  import jax
  import numpy as np
  params = eng.network.init(jax.random.PRNGKey(0),
                            np.zeros((1, 84, 84, 4), np.uint8))
  out = eng.network.apply(params, jax.random.PRNGKey(1),
                          np.zeros((1, 84, 84, 4), np.uint8))
  assert out.q_logits.shape[-1] == 21


def test_flag_surface_parses_and_collects():
  """absl flag definitions round-trip through _spec_overrides_from_flags."""
  from absl import flags
  from absl.testing import flagsaver
  from dqn_zoo_tpu.run import train as train_mod
  flags.FLAGS.mark_as_parsed()
  with flagsaver.flagsaver(
      learning_rate=5e-5, grad_error_bound=0.05, n_steps=5,
      huber_param=2.0, normalize_weights=False, num_quantiles=51,
      importance_sampling_exponent_begin_value=0.4,
      importance_sampling_exponent_end_value=1.0):
    ov = train_mod._spec_overrides_from_flags()
  assert ov == dict(learning_rate=5e-5, grad_error_bound=0.05, n_step=5,
                    huber_param=2.0, normalize_weights=False,
                    num_quantiles=51, importance_sampling_begin=0.4,
                    importance_sampling_end=1.0)
  # unset flags stay out of the overrides entirely
  assert "vmax" not in train_mod._spec_overrides_from_flags()


def test_unsupported_stack_and_repeat_flags_fail_loudly():
  from absl import flags
  from absl.testing import flagsaver
  from dqn_zoo_tpu.run import train as train_mod
  flags.FLAGS.mark_as_parsed()
  with flagsaver.flagsaver(num_action_repeats=3):
    with pytest.raises(ValueError, match="num_action_repeats"):
      train_mod._spec_overrides_from_flags()
  with flagsaver.flagsaver(num_stacked_frames=2):
    with pytest.raises(ValueError, match="num_stacked_frames"):
      train_mod._spec_overrides_from_flags()


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
      "normalized_return", "capped_normalized_return", "human_gap",
      "eval_frames"]
  assert float(rows[1]["train_episode_return"]) <= 1.0
  # eval_frames records the frames the eval phase ACTUALLY consumed (can
  # sit below the nominal budget — reset steps consume 1 raw frame, not 4 —
  # or above it, the driver extends up to 3x until an episode completes).
  assert all(0 < int(r["eval_frames"]) <= 3 * 400 for r in rows)


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
  replay_ts = []
  for run in range(3):  # iterations 0, 1, 2 — one per process
    proc = subprocess.run(args, capture_output=True, text=True, env=env,
                          timeout=540)
    assert proc.returncode == 0, f"run {run}: {proc.stderr[-3000:]}"
    import numpy as np
    meta = np.load(os.path.join(ckpt_path, "meta.npz"), allow_pickle=True)
    replay_ts.append(int(meta["x_replay_t"]))
  with open(csv_path) as f:
    rows = list(csv.DictReader(f))
  assert [r["iteration"] for r in rows] == ["0", "1", "2"]
  # The cumulative insert counter survives replay-less resumes (it drives
  # the PER IS anneal; round-4 advisor finding): strictly increasing across
  # legs, and leg N+1 continues from leg N's count rather than 0.
  assert replay_ts[1] > replay_ts[0] >= 0
  assert replay_ts[2] > replay_ts[1]
  # frames advance across processes: env_frames persisted in the checkpoint
  assert float(rows[2]["train_exploration_epsilon"]) <= float(
      rows[1]["train_exploration_epsilon"])


@pytest.mark.slow
def test_cli_mid_train_budget_resume(tmp_path):
  """Lease-budget workflow: with --max_run_seconds tiny, each process makes
  only chunk-level progress, saving MID-iteration (train_done in meta) and
  resuming exactly where the previous leg stopped. Models the hosted
  runtime's ~5-min lease that killed the round-3 breakout chain 5/5 inside
  its first train phase (VERDICT.md round 3)."""
  import numpy as np
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
  # 3200 frames at B=4 → 200 supersteps → 2 chunks of 100: at least one
  # leg must stop mid-iteration between the chunks.
  args = [
      sys.executable, "-c", code,
      "--agent=dqn", "--environment_name=catch", "--num_envs=4",
      "--replay_capacity=256", "--num_iterations=1",
      "--num_train_frames=3200", "--num_eval_frames=200",
      "--max_frames_per_episode=1000", "--batch_size=8",
      "--eval_num_envs=4", f"--results_csv_path={csv_path}",
      f"--checkpoint_path={ckpt_path}", "--max_run_seconds=1",
      "--checkpoint_replay=false", "--checkpoint_period=1"]
  saw_mid_train = False
  for leg in range(10):
    proc = subprocess.run(args, capture_output=True, text=True, env=env,
                          timeout=540)
    assert proc.returncode == 0, f"leg {leg}: {proc.stderr[-3000:]}"
    meta = np.load(os.path.join(ckpt_path, "meta.npz"), allow_pickle=True)
    if int(meta["train_done"]) > 0:
      saw_mid_train = True
    with open(csv_path) as f:
      rows = list(csv.DictReader(f))
    if [r["iteration"] for r in rows] == ["0", "1"]:
      break
  else:
    raise AssertionError("chain never finished in 10 legs")
  assert saw_mid_train, "no leg ever checkpointed mid-train"
  assert len(rows) == 2  # no duplicate rows despite many restarts


def test_cli_mesh_devices_trains_on_cpu_mesh(tmp_path):
  """--mesh_devices=8: the full iteration protocol (train/eval/CSV/
  checkpoint) through DistributedTrainer on the virtual CPU mesh — the
  north star's 'envs and replay sharded over hosts' driven from the CLI
  (the reference has no distributed runtime at all, SURVEY.md §2.6)."""
  csv_path = str(tmp_path / "results.csv")
  ckpt_path = str(tmp_path / "ckpt")
  env = dict(os.environ)
  env["JAX_PLATFORMS"] = "cpu"
  env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
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
      "--agent=dqn", "--environment_name=catch", "--mesh_devices=8",
      "--num_envs=16", "--replay_capacity=1024", "--num_iterations=1",
      "--num_train_frames=1600", "--num_eval_frames=320",
      "--max_frames_per_episode=1000", "--batch_size=16",
      "--eval_num_envs=8", f"--results_csv_path={csv_path}",
      f"--checkpoint_path={ckpt_path}",
      "--checkpoint_replay=false", "--checkpoint_period=1"]
  proc = subprocess.run(args, capture_output=True, text=True, env=env,
                        timeout=540)
  assert proc.returncode == 0, proc.stderr[-3000:]
  with open(csv_path) as f:
    rows = list(csv.DictReader(f))
  assert [r["iteration"] for r in rows] == ["0", "1"]
  assert int(rows[1]["train_num_episodes"]) > 0
  assert rows[1]["eval_episode_return"] != "nan"
  # The checkpoint was written (sharded DistState + meta).
  assert os.path.exists(os.path.join(ckpt_path, "meta.npz"))


@pytest.mark.slow
def test_cli_mesh_mid_train_budget_resume(tmp_path):
  """Distributed driver under the lease budget: legs on the CPU mesh save
  MID-iteration and resume, mirroring the single-device workflow (the
  hosted runtime's lease applies to multi-chip runs all the same)."""
  import numpy as np
  csv_path = str(tmp_path / "results.csv")
  ckpt_path = str(tmp_path / "ckpt")
  env = dict(os.environ)
  env["JAX_PLATFORMS"] = "cpu"
  env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
  env["PALLAS_AXON_POOL_IPS"] = ""
  env["PYTHONPATH"] = os.pathsep.join(
      [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
      + env.get("PYTHONPATH", "").split(os.pathsep))
  code = (
      "import jax; jax.config.update('jax_platforms','cpu');"
      "from absl import app; from dqn_zoo_tpu.run import train;"
      "import sys; app.run(train.main)")
  # 6400 frames at 16 global envs -> 100 supersteps... use 12800 -> 200
  # supersteps = 2 chunks so a leg can stop between them.
  args = [
      sys.executable, "-c", code,
      "--agent=dqn", "--environment_name=catch", "--mesh_devices=4",
      "--num_envs=16", "--replay_capacity=1024", "--num_iterations=1",
      "--num_train_frames=12800", "--num_eval_frames=320",
      "--max_frames_per_episode=1000", "--batch_size=16",
      "--eval_num_envs=4", f"--results_csv_path={csv_path}",
      f"--checkpoint_path={ckpt_path}", "--max_run_seconds=1",
      "--checkpoint_replay=false", "--checkpoint_period=1"]
  saw_mid_train = False
  for leg in range(10):
    proc = subprocess.run(args, capture_output=True, text=True, env=env,
                          timeout=540)
    assert proc.returncode == 0, f"leg {leg}: {proc.stderr[-3000:]}"
    meta = np.load(os.path.join(ckpt_path, "meta.npz"), allow_pickle=True)
    if int(meta["train_done"]) > 0:
      saw_mid_train = True
    with open(csv_path) as f:
      rows = list(csv.DictReader(f))
    if [r["iteration"] for r in rows] == ["0", "1"]:
      break
  else:
    raise AssertionError("mesh chain never finished in 10 legs")
  assert saw_mid_train, "no leg checkpointed mid-train on the mesh"
