"""Multi-device training driver: the full iteration protocol on a mesh.

`python -m dqn_zoo_tpu.run.train --mesh_devices=N ...` dispatches here: the
same train/eval/CSV/checkpoint loop as the single-device driver
(run/train.py, ref dqn/run_atari.py:98-292) but with envs, replay and
telemetry sharded over an N-device mesh and the learner data-parallel
(one gradient pmean per SGD step — parallel/distributed.py). The reference
has no distributed runtime at all (SURVEY.md §2.6); this is new capability.

Semantics: --num_envs is the GLOBAL stream count (split evenly over
devices); schedule clocks stay in global frame units via frame_multiplier,
so curves are comparable with single-device runs at the same flags.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import time

from absl import flags, logging
import jax
import numpy as np

from dqn_zoo_tpu.agents import get_agent
from dqn_zoo_tpu.engine import Engine, EngineConfig
from dqn_zoo_tpu.envs.vector import VectorEnvConfig
from dqn_zoo_tpu.parallel.distributed import DistributedTrainer, make_mesh
from dqn_zoo_tpu.run import atari_data
from dqn_zoo_tpu.run.checkpoint import OrbaxCheckpoint, NullCheckpoint
from dqn_zoo_tpu.run.trackers import StepRateTracker
from dqn_zoo_tpu.run.writers import CsvWriter, NullWriter

FLAGS = flags.FLAGS


def build_trainer(agent_name: str, game: str, num_devices: int,
                  num_envs_global: int, replay_capacity: int,
                  batch_size: int = 0,
                  replay_ratio_mode: str = "throughput",
                  max_frames_per_episode: int = 108000,
                  num_iterations: int = 200,
                  num_train_frames: int = int(1e6),
                  min_replay_capacity_fraction: float = -1.0,
                  spec_overrides: dict | None = None,
                  resize_method: str = "fast",
                  devices=None) -> DistributedTrainer:
  """DistributedTrainer factory mirroring run.train.build_engine semantics
  with global counts split across the mesh."""
  if num_envs_global % num_devices:
    raise ValueError(f"num_envs={num_envs_global} must divide evenly over "
                     f"mesh_devices={num_devices}.")
  spec = get_agent(agent_name)
  if spec_overrides:
    spec = dataclasses.replace(spec, **spec_overrides)
  if min_replay_capacity_fraction >= 0:
    spec = dataclasses.replace(
        spec, min_replay_capacity_fraction=min_replay_capacity_fraction)
  b = num_envs_global // num_devices  # per-device streams
  # Reference ratio preserved GLOBALLY: batch per learn_period frames
  # (dqn/run_atari.py defaults 32/16). Per-device batch = global/D (the
  # pmean'd gradient sees the full global batch each update).
  samples_per_superstep = max(
      1, round(4 * num_envs_global * spec.batch_size / spec.learn_period))
  if batch_size <= 0:
    if replay_ratio_mode == "parity":
      batch_size = spec.batch_size
    else:
      batch_size = max(spec.batch_size, samples_per_superstep)
  local_batch = max(1, batch_size // num_devices)
  updates = max(1, round(samples_per_superstep / batch_size))
  learn_every = max(1, round(batch_size / samples_per_superstep))
  if replay_ratio_mode == "throughput" and batch_size > spec.batch_size:
    scale = (batch_size / spec.batch_size) ** 0.5
    spec = dataclasses.replace(spec, learning_rate=spec.learning_rate * scale)
  slots = max(replay_capacity // num_envs_global, spec.n_step + 5)
  mesh = make_mesh(devices[:num_devices] if devices is not None
                   else jax.devices()[:num_devices])
  return DistributedTrainer(EngineConfig(
      agent=spec,
      game=game,
      num_envs=b,
      slots_per_stream=slots,
      batch_size=local_batch,
      learn_every=learn_every,
      updates_per_learn=updates,
      total_train_frames=num_iterations * num_train_frames,
      env_config=VectorEnvConfig(episode_frame_cap=max_frames_per_episode),
      resize_method=resize_method,
      pmap_axis="d",
      frame_multiplier=num_devices,
  ), mesh)


def main_dist(spec_overrides: dict):
  """Iteration protocol over the mesh. Reads the same absl flags as
  run.train.main (which dispatches here when --mesh_devices > 0)."""
  f = FLAGS
  d = f.mesh_devices
  avail = len(jax.devices())
  if d > avail:
    raise ValueError(f"--mesh_devices={d} but only {avail} devices visible.")
  trainer = build_trainer(
      f.agent, f.environment_name, d, f.num_envs, f.replay_capacity,
      f.batch_size, f.replay_ratio_mode, f.max_frames_per_episode,
      f.num_iterations, f.num_train_frames, f.min_replay_capacity_fraction,
      spec_overrides=spec_overrides, resize_method=f.resize_method)
  writer = CsvWriter(f.results_csv_path) if f.results_csv_path \
      else NullWriter()
  checkpoint = (OrbaxCheckpoint(f.checkpoint_path)
                if f.checkpoint_path else NullCheckpoint())

  rng = jax.random.PRNGKey(f.seed)
  rng, init_key = jax.random.split(rng)
  dstate = trainer.init(init_key)
  iteration = 0
  train_done = 0

  def strip(s):
    return s if f.checkpoint_replay else s._replace(
        per_device=s.per_device._replace(replay=None))

  if checkpoint.can_be_restored():
    logging.info("Restoring checkpoint.")
    restored, iteration, writer_state, train_done = checkpoint.restore(
        strip(dstate))
    if not f.checkpoint_replay:
      replay = dstate.per_device.replay
      # Persisted insert counter / max priority (see run/train.py: the PER
      # IS anneal is a schedule over cumulative inserts and must survive
      # replay-less resumes). Per-device counters run in lockstep, so one
      # scalar restores all shards.
      extras = checkpoint.restore_extras()
      if "replay_t" in extras:
        replay = replay._replace(
            t=replay.t * 0 + int(extras["replay_t"]),
            max_seen_priority=(replay.max_seen_priority * 0
                               + extras["replay_max_priority"]))
      restored = restored._replace(per_device=restored.per_device._replace(
          replay=replay))
    dstate = restored
    writer.set_state(writer_state)

  t_claim = [None]

  def fence(s) -> int:
    v = int(np.asarray(jax.device_get(s.per_device.env_frames)).sum())
    if t_claim[0] is None:
      t_claim[0] = time.monotonic()
    return v

  def over_budget() -> bool:
    return bool(f.max_run_seconds) and t_claim[0] is not None and \
        time.monotonic() - t_claim[0] > f.max_run_seconds

  def do_save(st, it, td):
    extras = None
    if not f.checkpoint_replay:
      extras = {
          "replay_t": int(np.max(jax.device_get(st.per_device.replay.t))),
          "replay_max_priority": float(np.max(
              jax.device_get(st.per_device.replay.max_seen_priority))),
      }
    checkpoint.save(strip(st), it, writer.get_state(), train_done=td,
                    extras=extras)
    logging.info("Checkpoint saved (iteration=%d, train_done=%d).", it, td)

  fence(dstate)

  frames_per_superstep = 4 * f.num_envs  # global
  train_supersteps = max(1, f.num_train_frames // frames_per_superstep)
  eval_envs = f.eval_num_envs
  if eval_envs <= 0:
    eval_envs = max(1, f.num_eval_frames // max(1, f.max_frames_per_episode))
  eval_envs = max(d, min(eval_envs, f.num_envs))
  eval_envs_per_dev = max(1, eval_envs // d)
  eval_supersteps = max(
      1, f.num_eval_frames // (4 * eval_envs_per_dev * d))

  _train_runs, _eval_runs = {}, {}

  def train_chunk(k, s):
    if k not in _train_runs:
      _train_runs[k] = trainer.make_run(num_supersteps=k)
    return _train_runs[k](s)

  def eval_chunk(k, params, es):
    if k not in _eval_runs:
      _eval_runs[k] = trainer.make_eval_run(num_supersteps=k)
    return _eval_runs[k](params, es)

  run_iterations = 0
  aborted = False
  while iteration <= f.num_iterations:
    if f.iterations_per_run and run_iterations >= f.iterations_per_run:
      logging.info("iterations_per_run reached; exiting for resume.")
      break
    if over_budget():
      logging.info("max_run_seconds reached; exiting for resume.")
      break
    run_iterations += 1
    logging.info("Training iteration %d (mesh=%d).", iteration, d)
    n = 0 if iteration == 0 else train_supersteps
    done = min(train_done, n)
    train_done = 0
    if done == 0:
      dstate = trainer.reset_telemetry(dstate)
    elif done < n:
      logging.info("Resuming train phase at superstep %d/%d.", done, n)
    rate = StepRateTracker()
    rate.update(0)
    frames_before = fence(dstate)
    while done < n:
      k = min(100, n - done)
      dstate = train_chunk(k, dstate)
      done += k
      fence(dstate)
      if done < n and over_budget():
        logging.info("max_run_seconds hit mid-train; saving and exiting.")
        do_save(dstate, iteration, done)
        aborted = True
        break
    if aborted:
      break
    if n and over_budget():
      do_save(dstate, iteration, n)
      break
    train_m = trainer.metrics(dstate)
    rate.update(train_m["env_frames"] - frames_before)
    train_rate = rate.get()["step_rate"] if n else float("nan")

    logging.info("Evaluation iteration %d.", iteration)
    rng, eval_key = jax.random.split(rng)
    estate = trainer.eval_init(eval_key, num_envs=eval_envs_per_dev)
    erate = StepRateTracker()
    erate.update(0)
    done = 0
    while done < eval_supersteps or (
        done < 3 * eval_supersteps
        and trainer.eval_metrics(estate)["episodes"] == 0):
      # Cap extension chunks at the 3x ceiling (see run/train.py).
      cap = eval_supersteps if done < eval_supersteps else 3 * eval_supersteps
      k = min(100, cap - done)
      estate = eval_chunk(k, dstate.online_params, estate)
      done += k
    em = trainer.eval_metrics(estate)
    erate.update(em["env_frames"])
    eval_episodes = int(em["episodes"])
    eval_return = em["mean_episode_return"]

    human_norm = atari_data.get_human_normalized_score(
        f.environment_name, eval_return)
    capped = np.amin([1.0, human_norm])
    log_output = [
        ("iteration", iteration, "%3d"),
        ("frame", iteration * f.num_train_frames, "%5d"),
        ("eval_episode_return", eval_return, "% 2.2f"),
        ("train_episode_return",
         train_m["mean_episode_return"] if n else float("nan"), "% 2.2f"),
        ("eval_num_episodes", eval_episodes, "%3d"),
        ("train_num_episodes", int(train_m["episodes"]), "%3d"),
        ("eval_frame_rate", erate.get()["step_rate"], "%4.0f"),
        ("train_frame_rate", train_rate, "%4.0f"),
        ("train_exploration_epsilon",
         train_m["exploration_epsilon"], "%.3f"),
        ("train_state_value", train_m["state_value_ewma"], "%.3f"),
        ("normalized_return", human_norm, "%.3f"),
        ("capped_normalized_return", capped, "%.3f"),
        ("human_gap", 1.0 - capped, "%.3f"),
        # Frames the eval phase actually ran (budget may extend up to 3x
        # until an episode completes — see run/train.py field 14).
        ("eval_frames", int(em["env_frames"]), "%d"),
    ]
    logging.info(", ".join(("%s: " + fmt) % (n_, v)
                           for n_, v, fmt in log_output))
    writer.write(collections.OrderedDict((n_, v) for n_, v, _ in log_output))
    iteration += 1
    exiting = (f.iterations_per_run
               and run_iterations >= f.iterations_per_run) \
        or iteration > f.num_iterations or over_budget()
    if exiting or iteration % f.checkpoint_period == 0:
      do_save(dstate, iteration, 0)

  writer.close()
