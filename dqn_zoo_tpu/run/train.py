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
_MAX_RUN_SECONDS = flags.DEFINE_integer(
    "max_run_seconds", 0,
    "Wall-clock budget measured from the first successful device fetch "
    "(= TPU claim). Past it, the driver saves (mid-iteration if needed) and "
    "exits cleanly at the next chunk boundary. 0 disables. Needed on hosted "
    "runtimes that revoke the device lease a few minutes after claim: the "
    "round-3 breakout chain died 5/5 with FAILED_PRECONDITION inside its "
    "first train phase, before any save point existed.")
_SAVE_INTERVAL_SECONDS = flags.DEFINE_integer(
    "save_interval_seconds", 0,
    "Also save mid-train every N seconds (0 = only at iteration boundaries "
    "and budget exit), so an unexpected lease death loses at most ~N s of "
    "work. Requires --checkpoint_path.")
# --- agent hyperparameter overrides (reference flag surface,
# dqn/run_atari.py:49-95 and the per-agent runners). Unset (None / <0)
# keeps the agent's reference default from its AgentSpec. Values round-trip
# into the spec via dataclasses.replace (tested in tests/test_train_cli.py).
_LEARNING_RATE = flags.DEFINE_float("learning_rate", None, "")
_OPTIMIZER_EPSILON = flags.DEFINE_float("optimizer_epsilon", None, "")
_TARGET_NETWORK_UPDATE_PERIOD = flags.DEFINE_integer(
    "target_network_update_period", 0, "In environment frames; 0 = default.")
_EXPLORATION_EPSILON_BEGIN = flags.DEFINE_float(
    "exploration_epsilon_begin_value", None, "")
_EXPLORATION_EPSILON_END = flags.DEFINE_float(
    "exploration_epsilon_end_value", None, "")
_EXPLORATION_EPSILON_DECAY_FRAME_FRACTION = flags.DEFINE_float(
    "exploration_epsilon_decay_frame_fraction", None, "")
_EVAL_EXPLORATION_EPSILON = flags.DEFINE_float(
    "eval_exploration_epsilon", None, "")
_LEARN_PERIOD = flags.DEFINE_integer(
    "learn_period", 0,
    "Frames between learn steps in the reference schedule; with batch_size "
    "it sets the sample/insert ratio the vectorized engine preserves.")
_GRAD_ERROR_BOUND = flags.DEFINE_float(
    "grad_error_bound", None, "DQN-family TD-error clip (±); e.g. 1/32.")
_MAX_GLOBAL_GRAD_NORM = flags.DEFINE_float(
    "max_global_grad_norm", None, "0 disables clipping.")
_N_STEPS = flags.DEFINE_integer(
    "n_steps", 0, "n-step return length (rainbow default 3).")
_PRIORITY_EXPONENT = flags.DEFINE_float("priority_exponent", None, "")
_IMPORTANCE_SAMPLING_EXPONENT_BEGIN = flags.DEFINE_float(
    "importance_sampling_exponent_begin_value", None, "")
_IMPORTANCE_SAMPLING_EXPONENT_END = flags.DEFINE_float(
    "importance_sampling_exponent_end_value", None, "")
_UNIFORM_SAMPLE_PROBABILITY = flags.DEFINE_float(
    "uniform_sample_probability", None, "")
_NORMALIZE_WEIGHTS = flags.DEFINE_boolean("normalize_weights", None, "")
_COMPUTE_DTYPE = flags.DEFINE_string(
    "compute_dtype", "", "float32 (default) or bfloat16.")
_NUM_ACTION_REPEATS = flags.DEFINE_integer(
    "num_action_repeats", 0, "Raw frames per agent step; 0 = 4.")
_NUM_STACKED_FRAMES = flags.DEFINE_integer(
    "num_stacked_frames", 0,
    "Observation stack depth. Only 4 is supported (the Atari torso and the "
    "replay frame-dedup store are built for 84x84x4); the flag exists so "
    "reference command lines parse and misuse fails loudly.")
# per-agent extras (c51/qrdqn/rainbow/iqn runner flags)
_VMAX = flags.DEFINE_float("vmax", None, "c51/rainbow support half-width.")
_NUM_ATOMS = flags.DEFINE_integer("num_atoms", 0, "c51/rainbow atoms.")
_NUM_QUANTILES = flags.DEFINE_integer("num_quantiles", 0, "qrdqn quantiles.")
_HUBER_PARAM = flags.DEFINE_float("huber_param", None, "qrdqn/iqn Huber κ.")
_TAU_LATENT_DIM = flags.DEFINE_integer("tau_latent_dim", 0, "iqn.")
_TAU_SAMPLES_POLICY = flags.DEFINE_integer("tau_samples_policy", 0, "iqn.")
_TAU_SAMPLES_S_TM1 = flags.DEFINE_integer("tau_samples_s_tm1", 0, "iqn.")
_TAU_SAMPLES_S_T = flags.DEFINE_integer("tau_samples_s_t", 0, "iqn.")
_NOISY_WEIGHT_INIT = flags.DEFINE_float("noisy_weight_init", None, "rainbow.")

_RESIZE_METHOD = flags.DEFINE_enum(
    "resize_method", "fast", ["fast", "pil"],
    "84x84 resize: fast (antialiased float bilinear) or pil (bit-exact "
    "Pillow fixed-point resample matching the reference's pinned golden, "
    "ref processors_test.py:465-476).")
_MESH_DEVICES = flags.DEFINE_integer(
    "mesh_devices", 0,
    "Run the full iteration protocol data-parallel over an N-device "
    "jax.sharding.Mesh (envs/replay/telemetry sharded, learner pmean'd — "
    "run/train_dist.py). 0 = single device. num_envs is global and must "
    "divide evenly.")
_EVAL_NUM_ENVS = flags.DEFINE_integer(
    "eval_num_envs", 0,
    "Eval env streams: fewer than training so whole episodes complete "
    "within the eval frame budget (the reference runs ONE stream for 5e5 "
    "frames; B streams each get budget/B frames). 0 = auto-size so each "
    "stream's budget covers one max-length episode "
    "(num_eval_frames // max_frames_per_episode), guaranteeing every "
    "iteration logs a non-NaN eval return like the reference protocol "
    "(dqn/run_atari.py:260-264).")


def _spec_overrides_from_flags() -> dict:
  """Collect the reference flag surface (dqn/run_atari.py:49-95 + per-agent
  runner flags) into AgentSpec field overrides. Unset flags (None, or 0/-1
  for integer flags whose real values are positive) are omitted, so agent
  defaults survive."""
  if _NUM_ACTION_REPEATS.value not in (0, 4):
    raise ValueError("num_action_repeats: only 4 is supported (the engine's "
                     "superstep and preprocessing are built around action "
                     f"repeat 4); got {_NUM_ACTION_REPEATS.value}.")
  if _NUM_STACKED_FRAMES.value not in (0, 4):
    raise ValueError("num_stacked_frames: only 4 is supported (84x84x4 torso "
                     f"and frame-dedup replay); got {_NUM_STACKED_FRAMES.value}.")
  floats = {
      "learning_rate": _LEARNING_RATE,
      "optimizer_epsilon": _OPTIMIZER_EPSILON,
      "exploration_epsilon_begin": _EXPLORATION_EPSILON_BEGIN,
      "exploration_epsilon_end": _EXPLORATION_EPSILON_END,
      "exploration_epsilon_decay_frame_fraction":
          _EXPLORATION_EPSILON_DECAY_FRAME_FRACTION,
      "eval_exploration_epsilon": _EVAL_EXPLORATION_EPSILON,
      "grad_error_bound": _GRAD_ERROR_BOUND,
      "max_global_grad_norm": _MAX_GLOBAL_GRAD_NORM,
      "priority_exponent": _PRIORITY_EXPONENT,
      "importance_sampling_begin": _IMPORTANCE_SAMPLING_EXPONENT_BEGIN,
      "importance_sampling_end": _IMPORTANCE_SAMPLING_EXPONENT_END,
      "uniform_sample_probability": _UNIFORM_SAMPLE_PROBABILITY,
      "vmax": _VMAX,
      "huber_param": _HUBER_PARAM,
      "noisy_weight_init": _NOISY_WEIGHT_INIT,
  }
  ints = {
      "target_network_update_period": _TARGET_NETWORK_UPDATE_PERIOD,
      "learn_period": _LEARN_PERIOD,
      "n_step": _N_STEPS,
      "num_atoms": _NUM_ATOMS,
      "num_quantiles": _NUM_QUANTILES,
      "tau_latent_dim": _TAU_LATENT_DIM,
      "tau_samples_policy": _TAU_SAMPLES_POLICY,
      "tau_samples_s_tm1": _TAU_SAMPLES_S_TM1,
      "tau_samples_s_t": _TAU_SAMPLES_S_T,
  }
  overrides = {k: f.value for k, f in floats.items() if f.value is not None}
  overrides.update({k: f.value for k, f in ints.items() if f.value > 0})
  if _NORMALIZE_WEIGHTS.value is not None:
    overrides["normalize_weights"] = _NORMALIZE_WEIGHTS.value
  if _COMPUTE_DTYPE.value:
    overrides["compute_dtype"] = _COMPUTE_DTYPE.value
  return overrides


def build_engine(agent_name: str, game: str, num_envs: int,
                 replay_capacity: int, batch_size: int = 0,
                 replay_ratio_mode: str = "throughput",
                 max_frames_per_episode: int = 108000,
                 num_iterations: int = 200,
                 num_train_frames: int = int(1e6),
                 min_replay_capacity_fraction: float = -1.0,
                 spec_overrides: dict | None = None,
                 resize_method: str = "fast") -> Engine:
  """Engine factory shared by the CLI, tests and bench."""
  import dataclasses
  spec = get_agent(agent_name)
  if spec_overrides:
    spec = dataclasses.replace(spec, **spec_overrides)
  if min_replay_capacity_fraction >= 0:
    spec = dataclasses.replace(
        spec, min_replay_capacity_fraction=min_replay_capacity_fraction)
  b = num_envs
  # Reference ratio: batch_size samples per learn_period frames (defaults
  # 32/16 = 2 samples per env frame, dqn/run_atari.py). One superstep = 4·B
  # frames → 4·B·(batch/learn_period) samples per superstep.
  samples_per_superstep = max(1, round(4 * b * spec.batch_size
                                       / spec.learn_period))
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
      resize_method=resize_method,
  ))


def main(argv):
  del argv
  import os
  cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "")
  if cache:
    # Persistent compile cache: chained lease-split runs re-trace the same
    # programs every leg; a disk cache amortizes the ~40-90s compiles.
    try:
      jax.config.update("jax_compilation_cache_dir", cache)
      jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # plugin may not support it; never fatal.
      logging.warning("Compilation cache unavailable: %s", e)
  if _MESH_DEVICES.value > 0:
    from dqn_zoo_tpu.run import train_dist
    return train_dist.main_dist(_spec_overrides_from_flags())
  engine = build_engine(
      _AGENT.value, _ENVIRONMENT_NAME.value, _NUM_ENVS.value,
      _REPLAY_CAPACITY.value, _BATCH_SIZE.value, _REPLAY_RATIO_MODE.value,
      _MAX_FRAMES_PER_EPISODE.value, _NUM_ITERATIONS.value,
      _NUM_TRAIN_FRAMES.value, _MIN_REPLAY_CAPACITY_FRACTION.value,
      spec_overrides=_spec_overrides_from_flags(),
      resize_method=_RESIZE_METHOD.value)
  writer = CsvWriter(_RESULTS_CSV_PATH.value) if _RESULTS_CSV_PATH.value \
      else NullWriter()
  checkpoint = (OrbaxCheckpoint(_CHECKPOINT_PATH.value)
                if _CHECKPOINT_PATH.value else NullCheckpoint())

  import time

  rng = jax.random.PRNGKey(_SEED.value)
  rng, init_key = jax.random.split(rng)

  # --- lease-budget machinery. The hosted runtime defers execution: jitted
  # calls return before the device runs them, so wall-clock control needs a
  # real host fetch (fence) at chunk boundaries. The claim clock starts at
  # the first successful fetch (claims themselves can wedge for minutes).
  t_claim = [None]

  def fence(s) -> int:
    v = int(jax.device_get(s.env_frames))
    if t_claim[0] is None:
      t_claim[0] = time.monotonic()
      logging.info("Device claimed (first fetch done).")
    return v

  state = engine.init(init_key)
  # Materialize the (multi-GB) init graph BEFORE restoring: executing the
  # deferred init pile and the orbax restore in one burst OOM'd the chip
  # (leg-3 RESOURCE_EXHAUSTED at the post-restore fence); forced first, the
  # restore only adds the ~100MB of non-replay leaves to a stable heap.
  fence(state)
  iteration = 0
  train_done = 0  # supersteps already finished inside `iteration`'s train

  def strip(s):
    # None is an empty pytree subtree: orbax skips it on save and restore,
    # and the restored state keeps the freshly initialized replay.
    return s if _CHECKPOINT_REPLAY.value else s._replace(replay=None)

  if checkpoint.can_be_restored():
    logging.info("Restoring checkpoint.")
    restored, iteration, writer_state, train_done = checkpoint.restore(
        strip(state))
    if not _CHECKPOINT_REPLAY.value:
      replay = state.replay
      # The insert counter and max-seen priority outlive the stripped
      # replay (saved as meta extras): the PER importance-sampling anneal
      # is a schedule over cumulative inserts (engine/superstep.py) and
      # insert priorities use the running max (ref prioritized/agent.py:80,
      # 155,205) — resetting them every resumed leg silently rewound both.
      extras = checkpoint.restore_extras()
      if "replay_t" in extras:
        replay = replay._replace(
            t=replay.t * 0 + int(extras["replay_t"]),
            max_seen_priority=(replay.max_seen_priority * 0
                               + extras["replay_max_priority"]))
      restored = restored._replace(replay=replay)
    state = restored
    writer.set_state(writer_state)
    logging.info("Restored at iteration=%d train_done=%d.",
                 iteration, train_done)

  def elapsed() -> float:
    return 0.0 if t_claim[0] is None else time.monotonic() - t_claim[0]

  def over_budget() -> bool:
    return bool(_MAX_RUN_SECONDS.value) and elapsed() > _MAX_RUN_SECONDS.value

  last_save = [time.monotonic()]

  def do_save(st, it, td):
    t = time.monotonic()
    extras = None
    if not _CHECKPOINT_REPLAY.value:
      extras = {
          "replay_t": int(jax.device_get(st.replay.t)),
          "replay_max_priority":
              float(jax.device_get(st.replay.max_seen_priority)),
      }
    checkpoint.save(strip(st), it, writer.get_state(), train_done=td,
                    extras=extras)
    last_save[0] = time.monotonic()
    logging.info("Checkpoint saved (iteration=%d, train_done=%d) in %.1fs.",
                 it, td, last_save[0] - t)


  b = engine.config.num_envs
  frames_per_superstep = 4 * b
  train_supersteps = max(1, _NUM_TRAIN_FRAMES.value // frames_per_superstep)
  eval_envs = _EVAL_NUM_ENVS.value
  if eval_envs <= 0:
    eval_envs = max(
        1, _NUM_EVAL_FRAMES.value // max(1, _MAX_FRAMES_PER_EPISODE.value))
  eval_envs = min(eval_envs, b)
  eval_supersteps = max(1, _NUM_EVAL_FRAMES.value // (4 * eval_envs))

  import functools
  # jit-per-chunk-length caches: the tail chunk (iteration length not a
  # multiple of 100) compiles once, not once per iteration.
  _train_chunks, _eval_chunks = {}, {}

  def train_chunk(k, state):
    if k not in _train_chunks:
      # Donating the state halves peak HBM: the replay buffer (7 GB at the
      # reference 1e6 capacity) aliases in-place instead of living twice
      # across the call (16 GB chip; in+out copies OOM'd post-restore).
      _train_chunks[k] = jax.jit(
          functools.partial(engine.run, num_supersteps=k), donate_argnums=0)
    return _train_chunks[k](state)

  def eval_chunk(k, params, estate):
    if k not in _eval_chunks:
      _eval_chunks[k] = jax.jit(
          functools.partial(engine.eval_run, num_supersteps=k),
          donate_argnums=1)
    return _eval_chunks[k](params, estate)

  run_iterations = 0
  aborted = False
  while iteration <= _NUM_ITERATIONS.value:
    if _ITERATIONS_PER_RUN.value and run_iterations >= \
        _ITERATIONS_PER_RUN.value:
      logging.info("iterations_per_run reached; exiting for resume.")
      break
    if over_budget():
      logging.info("max_run_seconds reached; exiting for resume.")
      break
    run_iterations += 1
    # --- train phase (iteration 0 is eval-only, ref run_atari.py:254-255)
    logging.info("Training iteration %d.", iteration)
    n = 0 if iteration == 0 else train_supersteps
    done = min(train_done, n)
    train_done = 0
    if done == 0:
      # A mid-iteration resume keeps the restored telemetry (the phase
      # already started in a previous process).
      state = engine.reset_telemetry(state)
    elif done < n:
      logging.info("Resuming train phase at superstep %d/%d.", done, n)
    rate = StepRateTracker()
    rate.update(0)
    frames_before = fence(state)
    first_chunk_banked = False
    while done < n:
      k = min(100, n - done)
      state = train_chunk(k, state)
      done += k
      fence(state)
      if done < n and over_budget():
        logging.info("max_run_seconds hit mid-train; saving and exiting.")
        do_save(state, iteration, done)
        aborted = True
        break
      # Bank the leg's FIRST completed chunk immediately (not waiting for
      # the save interval): under a degraded device lease (~18s after
      # claim was observed 2026-08-21) the first post-restore execution
      # is the slow one and legs died before their first interval save —
      # four consecutive legs restored the same superstep. One extra save
      # per leg is noise in healthy regimes and monotone progress in bad
      # ones.
      if done < n and _SAVE_INTERVAL_SECONDS.value and (
          not first_chunk_banked
          or time.monotonic() - last_save[0] > _SAVE_INTERVAL_SECONDS.value):
        do_save(state, iteration, done)
        first_chunk_banked = True
    if aborted:
      break
    if n and over_budget():
      # Train finished but no budget left for eval: bank the train phase
      # (train_done=n → the next process goes straight to eval).
      logging.info("max_run_seconds hit post-train; saving and exiting.")
      do_save(state, iteration, n)
      break
    train_m = jax.device_get(engine.metrics(state))
    rate.update(int(train_m.env_frames) - frames_before)
    train_rate = rate.get()["step_rate"] if n else float("nan")

    # --- eval phase
    logging.info("Evaluation iteration %d.", iteration)
    rng, eval_key = jax.random.split(rng)
    estate = engine.eval_init(eval_key, num_envs=eval_envs)
    erate = StepRateTracker()
    erate.update(0)
    # Run the eval frame budget; if no episode completed (streams × budget
    # too small for one episode), extend up to 3× the budget until one does —
    # the reference's single-stream protocol always completes episodes
    # (dqn/run_atari.py:260-264 with the 108k cap), so a NaN eval return
    # would be a protocol violation, not a signal.
    done = 0
    while done < eval_supersteps or (
        done < 3 * eval_supersteps
        and int(jax.device_get(estate.completed_count)) == 0):
      # Extension chunks are capped at the 3x ceiling too, so eval_frames
      # never overshoots the documented budget (it did at tiny test scales,
      # where one 100-superstep chunk dwarfed the budget itself).
      cap = eval_supersteps if done < eval_supersteps else 3 * eval_supersteps
      k = min(100, cap - done)
      estate = eval_chunk(k, state.online_params, estate)
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
        # 14th field beyond the reference's 13 (dqn/run_atari.py:271-288):
        # frames the eval phase ACTUALLY ran. The driver may extend the
        # budget up to 3x until an episode completes (unlike the
        # reference's fixed single-stream 5e5); without this column two
        # runs' eval returns could silently represent different budgets.
        ("eval_frames", int(estate.env_frames), "%d"),
    ]
    logging.info(", ".join(("%s: " + f) % (n_, v) for n_, v, f in log_output))
    writer.write(collections.OrderedDict((n_, v) for n_, v, _ in log_output))
    iteration += 1
    exiting = (_ITERATIONS_PER_RUN.value
               and run_iterations >= _ITERATIONS_PER_RUN.value) \
        or iteration > _NUM_ITERATIONS.value or over_budget()
    if exiting or iteration % _CHECKPOINT_PERIOD.value == 0:
      do_save(state, iteration, 0)

  writer.close()


if __name__ == "__main__":
  app.run(main)
