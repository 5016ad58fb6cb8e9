"""Multi-chip data-parallel training via shard_map over a device mesh.

The reference has no parallelism of any kind (SURVEY.md §2.6); this layer is
new capability. Design (DESIGN.md):

  mesh axis `d` (data). Envs, preprocessing state, replay shard, RNG and
  telemetry live PER DEVICE (leading dim D, sharded over `d`); network and
  optimizer state are REPLICATED. The only cross-chip traffic on the whole
  training path is one gradient `pmean` per SGD step (engine/superstep.py,
  pmap_axis) — the actor path (env physics, rendering, preprocessing, replay
  insert/sample) is entirely device-local, riding HBM not ICI.

  Schedule clocks stay in global frame units with zero collectives by
  scaling local counters with EngineConfig.frame_multiplier = D.

Replication invariant: per-device RNG streams differ (different env/sample
randomness — that IS the data parallelism), but the `pmean`ed gradient and
the deterministic optimizer keep params bit-identical across devices;
shard_map cannot prove that, hence check_vma=False on the replicated specs.

Multi-host: the same program under `jax.distributed.initialize()` — the mesh
spans all processes' devices, each host only materializes its addressable
shards.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dqn_zoo_tpu.engine.superstep import Engine, EngineConfig, EngineState


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "d") -> Mesh:
  devices = list(devices if devices is not None else jax.devices())
  import numpy as np
  return Mesh(np.asarray(devices), (axis_name,))


class DistState(NamedTuple):
  """Distributed training state: sharded per-device part + replicated nets."""

  per_device: Any  # EngineState minus params/opt, every leaf stacked (D, ...)
  online_params: Any
  target_params: Any
  opt_state: Any


class _PerDevice(NamedTuple):
  env: Any
  stack: Any
  pending: Any
  replay: Any
  rng: Any
  env_frames: Any
  superstep: Any
  telemetry: Any


def _split_state(s: EngineState):
  per = _PerDevice(env=s.env, stack=s.stack, pending=s.pending,
                   replay=s.replay, rng=s.rng, env_frames=s.env_frames,
                   superstep=s.superstep, telemetry=s.telemetry)
  return per, s.online_params, s.target_params, s.opt_state


def _join_state(per: _PerDevice, online, target, opt) -> EngineState:
  return EngineState(env=per.env, stack=per.stack, pending=per.pending,
                     replay=per.replay, online_params=online,
                     target_params=target, opt_state=opt, rng=per.rng,
                     env_frames=per.env_frames, superstep=per.superstep,
                     telemetry=per.telemetry)


class DistributedTrainer:
  """Wraps an Engine in shard_map over a 1-D mesh.

  `config.num_envs` is the PER-DEVICE env count; `config.pmap_axis` must be
  the mesh axis name and `config.frame_multiplier` the device count.
  """

  def __init__(self, config: EngineConfig, mesh: Mesh):
    axis = mesh.axis_names[0]
    if config.pmap_axis != axis:
      raise ValueError(f"config.pmap_axis={config.pmap_axis!r} must equal "
                       f"mesh axis {axis!r}")
    if config.frame_multiplier != mesh.size:
      raise ValueError("config.frame_multiplier must equal mesh size "
                       f"({config.frame_multiplier} != {mesh.size})")
    self.engine = Engine(config)
    self.mesh = mesh
    self.axis = axis
    # Memoized aggregation jits (built on first use; see metrics()).
    self._eval_agg_fn = None
    self._metrics_agg_fn = None

  def init(self, key: jax.Array) -> DistState:
    """Builds the initial DistState as ONE global jit computation.

    Multi-host safe: nothing is materialized on the host and then
    device_put across processes — the jit's out_shardings lay each
    per-device shard out on its own device, and the replicated nets on all.
    """
    d = self.mesh.size
    shard = NamedSharding(self.mesh, P(self.axis))
    repl = NamedSharding(self.mesh, P())

    def build(key):
      keys = jax.random.split(jax.random.fold_in(key, 0), d)
      states = jax.vmap(self.engine.init)(keys)
      per, _, _, _ = _split_state(states)
      # Shared nets from a single init (same key on every process).
      state0 = self.engine.init(jax.random.fold_in(key, 1))
      return (per, state0.online_params, state0.target_params,
              state0.opt_state)

    shapes = jax.eval_shape(build, key)
    out_shardings = (
        jax.tree.map(lambda _: shard, shapes[0]),
        jax.tree.map(lambda _: repl, shapes[1]),
        jax.tree.map(lambda _: repl, shapes[2]),
        jax.tree.map(lambda _: repl, shapes[3]),
    )
    per, online, target, opt = jax.jit(build, out_shardings=out_shardings)(
        key)
    return DistState(per, online, target, opt)

  def make_run(self, num_supersteps: int):
    """Returns a jitted distributed runner: DistState -> DistState."""
    engine = self.engine
    axis = self.axis

    def body(per, online, target, opt):
      local = jax.tree.map(lambda x: jnp.squeeze(x, 0), per)
      state = _join_state(local, online, target, opt)
      state = engine.run(state, num_supersteps)
      per2, online2, target2, opt2 = _split_state(state)
      per2 = jax.tree.map(lambda x: x[None], per2)
      return per2, online2, target2, opt2

    sharded = jax.shard_map(
        body, mesh=self.mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=(P(axis), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def run(dstate: DistState) -> DistState:
      per, online, target, opt = sharded(
          dstate.per_device, dstate.online_params, dstate.target_params,
          dstate.opt_state)
      return DistState(per, online, target, opt)

    return run

  # --- evaluation ------------------------------------------------------------

  def eval_init(self, key: jax.Array, num_envs: Optional[int] = None):
    """Sharded eval state: `num_envs` streams PER DEVICE, laid out on their
    own devices via out_shardings (nothing materialized host-side)."""
    d = self.mesh.size
    shard = NamedSharding(self.mesh, P(self.axis))

    def build(key):
      keys = jax.random.split(key, d)
      return jax.vmap(lambda k: self.engine.eval_init(k, num_envs))(keys)

    shapes = jax.eval_shape(build, key)
    out_shardings = jax.tree.map(lambda _: shard, shapes)
    return jax.jit(build, out_shardings=out_shardings)(key)

  def make_eval_run(self, num_supersteps: int):
    """Jitted distributed eval runner: (replicated params, sharded eval
    state) -> sharded eval state. Actor-only — zero collectives (the whole
    eval path is device-local, like the training actor path)."""
    engine = self.engine
    axis = self.axis

    def body(online, estate):
      local = jax.tree.map(lambda x: jnp.squeeze(x, 0), estate)
      local = engine.eval_run(online, local, num_supersteps)
      return jax.tree.map(lambda x: x[None], local)

    sharded = jax.shard_map(
        body, mesh=self.mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sharded)

  def eval_metrics(self, estate):
    """Cross-shard eval aggregation (psum over the mesh axis)."""
    axis = self.axis

    # Built once and reused: train_dist evaluates this in its eval loop
    # condition every chunk, and a fresh jit closure per call defeats the
    # jit cache (round-4 advisor finding).
    if self._eval_agg_fn is None:
      def agg(e):
        local = jax.tree.map(lambda x: jnp.squeeze(x, 0), e)
        def tot(x):
          return jax.lax.psum(x.astype(jnp.float32), axis)
        return (tot(local.env_frames), tot(local.completed_count),
                tot(local.completed_return_sum))

      self._eval_agg_fn = jax.jit(jax.shard_map(
          agg, mesh=self.mesh, in_specs=(P(axis),), out_specs=P(),
          check_vma=False))
    frames, eps, rets = jax.device_get(self._eval_agg_fn(estate))
    episodes = float(eps)
    return {
        "env_frames": int(frames),
        "episodes": episodes,
        "mean_episode_return": float(rets) / episodes if episodes
        else float("nan"),
    }

  def metrics(self, dstate: DistState):
    """Aggregated metrics across shards (psum'd in jit — multi-host safe,
    every process reads its addressable replica)."""
    axis = self.axis
    engine = self.engine

    if self._metrics_agg_fn is None:
      def agg(per):
        local = jax.tree.map(lambda x: jnp.squeeze(x, 0), per)
        tel = local.telemetry
        def tot(x):
          return jax.lax.psum(x.astype(jnp.float32), axis)
        # In-progress fallback (ref parts.py:186-196 "else current"): mean of
        # per-stream running returns across ALL shards.
        in_prog = tot(jnp.sum(tel.episode_return))
        n_streams = tot(jnp.asarray(tel.episode_return.shape[0],
                                    jnp.float32))
        return (tot(local.env_frames), tot(tel.completed_count),
                tot(tel.completed_return_sum), tot(tel.learn_steps),
                tot(tel.state_value_ewma), tot(tel.ewma_trace),
                in_prog / n_streams,
                jax.lax.pmean(
                    engine.exploration_epsilon(
                        local.env_frames.astype(jnp.float32)), axis))

      self._metrics_agg_fn = jax.jit(jax.shard_map(
          agg, mesh=self.mesh, in_specs=(P(axis),), out_specs=P(),
          check_vma=False))
    (frames, eps, rets, learns, ewma, trace, in_prog,
     expl) = jax.device_get(self._metrics_agg_fn(dstate.per_device))
    episodes = float(eps)
    return {
        "env_frames": int(frames),
        "episodes": episodes,
        "mean_episode_return": float(rets) / episodes if episodes
        else float(in_prog),
        "learn_steps": int(learns),
        "state_value_ewma": float(ewma) / float(trace) if trace > 0
        else float("nan"),
        "exploration_epsilon": float(expl),
    }

  def reset_telemetry(self, dstate: DistState) -> DistState:
    """Per-phase tracker reset across all shards (Engine.reset_telemetry
    vmapped over the device axis; shardings preserved via jit)."""
    def reset_per(per):
      tel = per.telemetry
      # Derive each reset leaf from its input (×0 [+nan]) so the sharding
      # propagates — fresh constants would come out replicated and force a
      # reshard at the next shard_map entry.
      return per._replace(telemetry=tel._replace(
          completed_return_sum=tel.completed_return_sum * 0,
          completed_count=tel.completed_count * 0,
          last_episode_return=tel.last_episode_return * 0 + jnp.nan,
          last_loss=tel.last_loss * 0 + jnp.nan,
      ))

    per = jax.jit(reset_per)(dstate.per_device)
    return dstate._replace(per_device=per)
