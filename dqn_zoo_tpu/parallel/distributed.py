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

  def init(self, key: jax.Array) -> DistState:
    d = self.mesh.size
    keys = jax.random.split(key, d)
    # Per-device states built with vmap (cheap: init is host-side light).
    states = jax.vmap(self.engine.init)(keys)
    per, online_d, target_d, opt_d = _split_state(states)
    # Collapse the replicated nets (identical across the vmapped inits? NO —
    # vmapped init used different keys). Re-init once for the shared nets.
    state0 = self.engine.init(key)
    shard = NamedSharding(self.mesh, P(self.axis))
    repl = NamedSharding(self.mesh, P())
    per = jax.tree.map(lambda x: jax.device_put(x, shard), per)
    return DistState(
        per_device=per,
        online_params=jax.device_put(state0.online_params, repl),
        target_params=jax.device_put(state0.target_params, repl),
        opt_state=jax.device_put(state0.opt_state, repl),
    )

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

  def metrics(self, dstate: DistState):
    """Aggregated metrics across shards (host-side)."""
    per = jax.device_get(dstate.per_device)
    tel = per.telemetry
    import numpy as np
    total_frames = int(np.sum(per.env_frames))
    episodes = float(np.sum(tel.completed_count))
    ret_sum = float(np.sum(tel.completed_return_sum))
    return {
        "env_frames": total_frames,
        "episodes": episodes,
        "mean_episode_return": ret_sum / episodes if episodes else float("nan"),
        "learn_steps": int(np.sum(tel.learn_steps)),
    }
