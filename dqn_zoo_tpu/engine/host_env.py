"""Actor-learner engine over HOST environments (the C++ farm or real ALE).

Same algorithmic content as engine/superstep.py, but the env lives on the
host, so each agent-step is one device dispatch:

  host: C++ farm steps B envs (prev actions)  → obs84 group (B,84,84) u8
  device (one jitted call): stack update → act → replay insert → gated SGD
        → actions (B,) back to host

The host env runs in a background thread double-buffered against the device
call, so farm stepping overlaps device compute. Use this engine when the
environment cannot run under XLA (real ALE); the fused on-device engine is
faster when it can.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dqn_zoo_tpu import prep
from dqn_zoo_tpu.engine.superstep import Engine, EngineConfig, Telemetry
from dqn_zoo_tpu.envs.cpp_bridge import CppVectorEnv, HostGroupOutput
from dqn_zoo_tpu.replay import device_replay as dr


class HostEngineState(NamedTuple):
  stack: prep.FrameStackState
  replay: dr.ReplayState
  online_params: Any
  target_params: Any
  opt_state: Any
  rng: jax.Array
  env_frames: jax.Array
  superstep: jax.Array
  telemetry: Telemetry


class HostEnvEngine:
  """Drives a host vector env against the jitted device half-step."""

  def __init__(self, config: EngineConfig, env: CppVectorEnv):
    if env.batch_size != config.num_envs:
      raise ValueError("env.batch_size must match config.num_envs")
    # The host env is authoritative for the action set — this also makes
    # ALE-only cartridges (no JAX-native game) work: the fused engine then
    # skips its on-device env and sizes the network from num_actions.
    import dataclasses
    config = dataclasses.replace(config, num_actions=env.num_actions)
    self._fused = Engine(config)  # reuse its network/optimizer/schedules
    self.config = config
    self.spec = config.agent
    self.env = env
    self.network = self._fused.network
    self.optimizer = self._fused.optimizer
    self.rcfg = config.replay_config()
    self._device_step = jax.jit(self._step_impl)

  def init(self, key: jax.Array) -> HostEngineState:
    full = self._fused.init(key)
    return HostEngineState(
        stack=full.stack, replay=full.replay,
        online_params=full.online_params, target_params=full.target_params,
        opt_state=full.opt_state, rng=full.rng, env_frames=full.env_frames,
        superstep=full.superstep, telemetry=full.telemetry)

  # --- the jitted device half-step -----------------------------------------

  def _step_impl(self, state: HostEngineState, obs84, reward, discount,
                 is_first, is_last, raw_reward, frames_used):
    cfg = self.config
    eng = self._fused
    rng, act_key, learn_key = jax.random.split(state.rng, 3)

    stack = prep.frame_stack_update(state.stack, obs84, is_first)
    eps = eng.exploration_epsilon(state.env_frames.astype(jnp.float32))
    actions, values = self.spec.act(self.spec, self.network,
                                    state.online_params, act_key,
                                    stack.frames, eps)
    # This step's observation + action + the rewards that LED TO it form the
    # row (same alignment as the fused engine's pending-row scheme, resolved
    # in a single call here because the env stepped on the host already).
    replay = dr.replay_insert(
        self.rcfg, state.replay,
        frame=obs84,
        stack_count=stack.count,
        action=actions,
        reward=jnp.where(is_first, 0.0, jnp.clip(reward, -1.0, 1.0)),
        discount=jnp.where(is_first, 0.0, discount * 0.99),
        is_terminal=is_last,
    )
    env_frames = state.env_frames + jnp.sum(frames_used)

    min_fill = self.spec.min_replay_capacity_fraction * cfg.replay_capacity
    can_learn = (dr.replay_size(replay) >= min_fill) & \
        (jnp.mod(state.superstep, cfg.learn_every) == 0)

    import functools
    sgd = functools.partial(eng._sgd_update, replay, state.target_params)

    def learn(operand):
      online, opt_state, value_tree = operand
      keys = jax.random.split(learn_key, cfg.updates_per_learn)
      (online, opt_state, value_tree), losses = jax.lax.scan(
          sgd, (online, opt_state, value_tree), keys)
      return online, opt_state, value_tree, losses[-1], \
          jnp.asarray(cfg.updates_per_learn, jnp.int32)

    def no_learn(operand):
      online, opt_state, value_tree = operand
      return online, opt_state, value_tree, state.telemetry.last_loss, \
          jnp.zeros((), jnp.int32)

    online, opt_state, value_tree, last_loss, nupd = jax.lax.cond(
        can_learn, learn, no_learn,
        (state.online_params, state.opt_state, replay.value_tree))
    replay = replay._replace(value_tree=value_tree)

    period = max(1, self.spec.target_network_update_period
                 // cfg.frame_multiplier)
    crossed = (state.env_frames // period) != (env_frames // period)
    target = jax.tree.map(lambda o, t: jnp.where(crossed, o, t), online,
                          state.target_params)

    tel = state.telemetry
    ep_ret = tel.episode_return + raw_reward
    finished = is_last
    telemetry = Telemetry(
        episode_return=jnp.where(finished, 0.0, ep_ret),
        episode_frames=jnp.where(finished, 0,
                                 tel.episode_frames + frames_used),
        completed_return_sum=tel.completed_return_sum + jnp.sum(
            jnp.where(finished, ep_ret, 0.0)),
        completed_count=tel.completed_count + jnp.sum(finished),
        last_episode_return=tel.last_episode_return,
        state_value_ewma=(1 - 1e-3) * tel.state_value_ewma
        + 1e-3 * jnp.mean(values),
        ewma_trace=(1 - 1e-3) * tel.ewma_trace + 1e-3,
        last_loss=last_loss,
        learn_steps=tel.learn_steps + nupd,
    )
    new_state = HostEngineState(
        stack=stack, replay=replay, online_params=online,
        target_params=target, opt_state=opt_state, rng=rng,
        env_frames=env_frames, superstep=state.superstep + 1,
        telemetry=telemetry)
    return new_state, actions

  # --- host loop with env/device overlap ------------------------------------

  def run(self, state: HostEngineState, num_supersteps: int
          ) -> HostEngineState:
    b = self.config.num_envs
    actions_np = np.zeros((b,), np.int32)
    out = self.env.step(actions_np)  # initial FIRST groups
    for _ in range(num_supersteps):
      state, actions = self._device_step(
          state, jnp.asarray(out.obs84), jnp.asarray(out.reward_sum),
          jnp.asarray(out.discount_prod), jnp.asarray(out.is_first),
          jnp.asarray(out.is_last), jnp.asarray(out.reward_sum),
          jnp.asarray(out.frames_used))
      # Overlap: the farm steps while the device call above is still in
      # flight (dispatch is async; np.asarray(actions) synchronizes only on
      # the actions array).
      actions_np = np.asarray(actions)
      out = self.env.step(actions_np)
    return state

  def metrics(self, state: HostEngineState):
    tel = state.telemetry
    mean_ret = tel.completed_return_sum / jnp.maximum(tel.completed_count, 1)
    return {
        "env_frames": int(state.env_frames),
        "episodes": int(tel.completed_count),
        "mean_episode_return": float(mean_ret),
        "learn_steps": int(tel.learn_steps),
        "last_loss": float(tel.last_loss),
    }
