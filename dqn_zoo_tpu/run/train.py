"""Training driver CLI.

Usage: python -m dqn_zoo_tpu.run.train --agent=dqn --environment_name=pong ...

Reproduces the reference's run protocol (dqn/run_atari.py:98-292): iterations
of (train phase, eval phase), iteration 0 eval-only, the 13-field log/CSV
contract (dqn/run_atari.py:271-288), human-normalized scores, and real
checkpoint/resume (the reference ships only a NullCheckpoint stub,
parts.py:496-527 — here orbax persists the full device state including
replay, RNG, env and telemetry, satisfying the determinism contract of
README.md:201-210).

Flag names follow the reference where the concept carries over; new flags
cover the vectorized actor-learner (num_envs, learn cadence).
"""

from __future__ import annotations

import collections

from absl import app, flags, logging
import jax
import numpy as np

from dqn_zoo_tpu.agents import get_agent, all_agent_names
from dqn_zoo_tpu.engine import Engine, EngineConfig
from dqn_zoo_tpu.envs.vector import VectorEnvConfig
from dqn_zoo_tpu.run import atari_data
from dqn_zoo_tpu.run.checkpoint import OrbaxCheckpoint, NullCheckpoint
from dqn_zoo_tpu.run.trackers import StepRateTracker
from dqn_zoo_tpu.run.writers import CsvWriter, NullWriter

FLAGS = flags.FLAGS

_AGENT = flags.DEFINE_string("agent", "dqn", f"One of {all_agent_names()}")
_ENVIRONMENT_NAME = flags.DEFINE_string("environment_name", "pong", "")
_NUM_ENVS = flags.DEFINE_integer("num_envs", 128,
                                 "Parallel env streams on the device.")
_REPLAY_CAPACITY = flags.DEFINE_integer("replay_capacity", int(1e6),
                                        "Total transitions on the device.")
_MIN_REPLAY_CAPACITY_FRACTION = flags.DEFINE_float(
    "min_replay_capacity_fraction", -1.0,
    "Override; < 0 uses the agent default.")
_BATCH_SIZE = flags.DEFINE_integer("batch_size", 0,
                                   "0 → derived to preserve replay ratio.")
_MAX_FRAMES_PER_EPISODE = flags.DEFINE_integer("max_frames_per_episode",
                                               108000, "")
_NUM_ITERATIONS = flags.DEFINE_integer("num_iterations", 200, "")
_NUM_TRAIN_FRAMES = flags.DEFINE_integer("num_train_frames", int(1e6),
                                         "Per iteration, across streams.")
_NUM_EVAL_FRAMES = flags.DEFINE_integer("num_eval_frames", int(5e5), "")
_SEED = flags.DEFINE_integer("seed", 1, "")
_RESULTS_CSV_PATH = flags.DEFINE_string("results_csv_path",
                                        "/tmp/results.csv", "")
_CHECKPOINT_PATH = flags.DEFINE_string("checkpoint_path", "",
                                       "Empty disables checkpointing.")
_CHECKPOINT_REPLAY = flags.DEFINE_bool(
    "checkpoint_replay", True,
    "Include the replay buffer in checkpoints. True gives step-identical "
    "restores (the determinism contract, ref README.md:201-210); False "
    "skips the multi-GB frame store — restores re-fill replay under the "
    "usual min-fill gate — for fast checkpoint-split runs on hosted "
    "runtimes where fetching the full buffer is slow.")
_CHECKPOINT_PERIOD = flags.DEFINE_integer(
    "checkpoint_period", 1,
    "Save every N iterations (always saves before an iterations_per_run "
    "exit).")
_REPLAY_RATIO_MODE = flags.DEFINE_enum(
    "replay_ratio_mode", "throughput", ["parity", "throughput"],
    "parity: batch 32 × many updates (exact reference schedule); "
    "throughput: one big batch per superstep with the same sample ratio "
    "and sqrt(batch/32) learning-rate scaling.")
_ITERATIONS_PER_RUN = flags.DEFINE_integer(
    "iterations_per_run", 0,
    "Exit cleanly after this many iterations (0 = run to num_iterations). "
    "Lets long trainings split across processes via --checkpoint_path while "
    "schedule horizons (set by num_iterations) stay fixed — needed where a "
    "runtime bounds single-process device time.")
_EVAL_NUM_ENVS = flags.DEFINE_integer(
    "eval_num_envs", 32,
    "Eval env streams: fewer than training so whole episodes complete "
    "within the eval frame budget (the reference runs ONE stream for 5e5 "
    "frames; B streams each get budget/B frames).")


def build_engine(agent_name: str, game: str, num_envs: int,
                 replay_capacity: int, batch_size: int = 0,
                 replay_ratio_mode: str = "throughput",
                 max_frames_per_episode: int = 108000,
                 num_iterations: int = 200,
                 num_train_frames: int = int(1e6),
                 min_replay_capacity_fraction: float = -1.0) -> Engine:
  """Engine factory shared by the CLI, tests and bench."""
  import dataclasses
  spec = get_agent(agent_name)
  if min_replay_capacity_fraction >= 0:
    spec = dataclasses.replace(
        spec, min_replay_capacity_fraction=min_replay_capacity_fraction)
  b = num_envs
  # Reference ratio: batch 32 per 16 frames = 2 samples per env frame
  # (dqn/run_atari.py learn_period/batch defaults). One superstep ≈ 4·B
  # frames → 8·B samples per superstep.
  samples_per_superstep = 8 * b
  if batch_size <= 0:
    if replay_ratio_mode == "parity":
      batch_size = spec.batch_size
    else:
      batch_size = max(spec.batch_size, samples_per_superstep)
  updates = max(1, round(samples_per_superstep / batch_size))
  learn_every = max(1, round(batch_size / samples_per_superstep))
  if replay_ratio_mode == "throughput" and batch_size > spec.batch_size:
    # Square-root LR scaling for the enlarged batch (keeps the SGD noise
    # scale of the reference's batch-32 updates; parity mode leaves the
    # reference hyperparameters untouched).
    scale = (batch_size / spec.batch_size) ** 0.5
    spec = dataclasses.replace(spec, learning_rate=spec.learning_rate * scale)
  slots = max(replay_capacity // b, spec.n_step + 5)
  return Engine(EngineConfig(
      agent=spec,
      game=game,
      num_envs=b,
      slots_per_stream=slots,
      batch_size=batch_size,
      learn_every=learn_every,
      updates_per_learn=updates,
      total_train_frames=num_iterations * num_train_frames,
      env_config=VectorEnvConfig(episode_frame_cap=max_frames_per_episode),
  ))


def main(argv):
  del argv
  engine = build_engine(
      _AGENT.value, _ENVIRONMENT_NAME.value, _NUM_ENVS.value,
      _REPLAY_CAPACITY.value, _BATCH_SIZE.value, _REPLAY_RATIO_MODE.value,
      _MAX_FRAMES_PER_EPISODE.value, _NUM_ITERATIONS.value,
      _NUM_TRAIN_FRAMES.value, _MIN_REPLAY_CAPACITY_FRACTION.value)
  writer = CsvWriter(_RESULTS_CSV_PATH.value) if _RESULTS_CSV_PATH.value \
      else NullWriter()
  checkpoint = (OrbaxCheckpoint(_CHECKPOINT_PATH.value)
                if _CHECKPOINT_PATH.value else NullCheckpoint())

  rng = jax.random.PRNGKey(_SEED.value)
  rng, init_key = jax.random.split(rng)
  state = engine.init(init_key)
  iteration = 0

  def strip(s):
    # None is an empty pytree subtree: orbax skips it on save and restore,
    # and the restored state keeps the freshly initialized replay.
    return s if _CHECKPOINT_REPLAY.value else s._replace(replay=None)

  if checkpoint.can_be_restored():
    logging.info("Restoring checkpoint.")
    restored, iteration, writer_state = checkpoint.restore(strip(state))
    if not _CHECKPOINT_REPLAY.value:
      restored = restored._replace(replay=state.replay)
    state = restored
    writer.set_state(writer_state)

  b = engine.config.num_envs
  frames_per_superstep = 4 * b
  train_supersteps = max(1, _NUM_TRAIN_FRAMES.value // frames_per_superstep)
  eval_envs = min(_EVAL_NUM_ENVS.value, b)
  eval_supersteps = max(1, _NUM_EVAL_FRAMES.value // (4 * eval_envs))

  import functools
  train_chunk = jax.jit(functools.partial(engine.run, num_supersteps=100))
  eval_chunk = jax.jit(functools.partial(engine.eval_run, num_supersteps=100))

  run_iterations = 0
  while iteration <= _NUM_ITERATIONS.value:
    if _ITERATIONS_PER_RUN.value and run_iterations >= \
        _ITERATIONS_PER_RUN.value:
      logging.info("iterations_per_run reached; exiting for resume.")
      break
    run_iterations += 1
    # --- train phase (iteration 0 is eval-only, ref run_atari.py:254-255)
    logging.info("Training iteration %d.", iteration)
    state = engine.reset_telemetry(state)
    rate = StepRateTracker()
    rate.update(0)
    frames_before = int(state.env_frames)
    n = 0 if iteration == 0 else train_supersteps
    done = 0
    while done < n:
      k = min(100, n - done)
      state = train_chunk(state) if k == 100 else jax.jit(
          functools.partial(engine.run, num_supersteps=k))(state)
      done += k
    train_m = jax.device_get(engine.metrics(state))
    rate.update(int(train_m.env_frames) - frames_before)
    train_rate = rate.get()["step_rate"] if n else float("nan")

    # --- eval phase
    logging.info("Evaluation iteration %d.", iteration)
    rng, eval_key = jax.random.split(rng)
    estate = engine.eval_init(eval_key, num_envs=eval_envs)
    erate = StepRateTracker()
    erate.update(0)
    done = 0
    while done < eval_supersteps:
      k = min(100, eval_supersteps - done)
      estate = eval_chunk(state.online_params, estate) if k == 100 else \
          jax.jit(functools.partial(engine.eval_run, num_supersteps=k))(
              state.online_params, estate)
      done += k
    estate = jax.device_get(estate)
    erate.update(int(estate.env_frames))
    eval_episodes = int(estate.completed_count)
    eval_return = (float(estate.completed_return_sum) / eval_episodes
                   if eval_episodes else float("nan"))

    # --- logging (13-field contract, ref dqn/run_atari.py:271-288)
    human_norm = atari_data.get_human_normalized_score(
        _ENVIRONMENT_NAME.value, eval_return)
    capped = np.amin([1.0, human_norm])
    train_episodes = int(train_m.episodes)
    train_return = float(train_m.mean_episode_return) if n else float("nan")
    log_output = [
        ("iteration", iteration, "%3d"),
        ("frame", iteration * _NUM_TRAIN_FRAMES.value, "%5d"),
        ("eval_episode_return", eval_return, "% 2.2f"),
        ("train_episode_return", train_return, "% 2.2f"),
        ("eval_num_episodes", eval_episodes, "%3d"),
        ("train_num_episodes", train_episodes, "%3d"),
        ("eval_frame_rate", erate.get()["step_rate"], "%4.0f"),
        ("train_frame_rate", train_rate, "%4.0f"),
        ("train_exploration_epsilon",
         float(train_m.exploration_epsilon), "%.3f"),
        ("train_state_value", float(train_m.state_value_ewma), "%.3f"),
        ("normalized_return", human_norm, "%.3f"),
        ("capped_normalized_return", capped, "%.3f"),
        ("human_gap", 1.0 - capped, "%.3f"),
    ]
    logging.info(", ".join(("%s: " + f) % (n_, v) for n_, v, f in log_output))
    writer.write(collections.OrderedDict((n_, v) for n_, v, _ in log_output))
    iteration += 1
    exiting = (_ITERATIONS_PER_RUN.value
               and run_iterations >= _ITERATIONS_PER_RUN.value) \
        or iteration > _NUM_ITERATIONS.value
    if exiting or iteration % _CHECKPOINT_PERIOD.value == 0:
      checkpoint.save(strip(state), iteration, writer.get_state())

  writer.close()


if __name__ == "__main__":
  app.run(main)
