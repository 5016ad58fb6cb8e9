"""Trainable host-side agent: the reference's single-stream skeleton.

This assembles the host-compat pieces — `processors.AtariProcessor`,
`replay/host.py`, `nets`, `parts.run_loop` — into a learning agent with the
exact step structure of the reference's agents (dqn/agent.py:133-158):
preprocess (None → repeat cached action), act via jitted select_action,
accumulate → replay.add, min-fill gate, learn every `learn_period` frames
via jitted update, online→target copy every `target_network_update_period`
frames. One class serves all seven algorithms because an `AgentSpec`
already carries (network, loss, act, replay flavor, hyperparameters) —
the same observation that collapses the seven reference agent.py files
into the device engine (engine/superstep.py).

This is the migration path for dqn_zoo users with host code (custom envs,
callbacks, replay introspection); the TPU throughput path is the engine.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Optional

import dm_env
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dqn_zoo_tpu import parts
from dqn_zoo_tpu.agents.base import AgentSpec, make_optimizer
from dqn_zoo_tpu.replay import host as replay_lib
from dqn_zoo_tpu.utils.schedules import LinearSchedule


class HostAgent(parts.Agent):
  """Single-stream learning agent over any AgentSpec (ref dqn/agent.py:60-233).

  `step()` is called once per ENVIRONMENT FRAME; all periods are in frame
  units like the reference flags (README.md:136-138).
  """

  def __init__(
      self,
      spec: AgentSpec,
      num_actions: int,
      sample_network_input: np.ndarray,  # (84,84,4) uint8
      rng_key: jax.Array,
      preprocessor: Optional[Callable] = None,
      replay_capacity: int = 10_000,
      total_frames: int = 1_000_000,
      num_action_repeats: int = 4,
      exploration_epsilon: Optional[Callable[[int], float]] = None,
      random_state: Optional[np.random.RandomState] = None,
      compress_state: bool = False,
      learning_rate: Optional[float] = None,
  ):
    self.spec = spec
    self._preprocessor = preprocessor
    self._rng_key = rng_key
    self._batch_size = spec.batch_size
    self._learn_period = spec.learn_period
    self._target_period = spec.target_network_update_period
    self._min_replay_capacity = int(
        spec.min_replay_capacity_fraction * replay_capacity)
    self._frame_t = -1  # current frame index (ref dqn/agent.py:78)
    self._action = None
    self._statistics = {"state_value": np.nan}
    self._max_seen_priority = 1.0  # ref prioritized/agent.py:80

    random_state = random_state or np.random.RandomState(1)
    self._random_state = random_state
    if exploration_epsilon is None:
      if spec.greedy_actor:  # rainbow: noisy-net exploration
        exploration_epsilon = lambda t: 0.0
      else:
        exploration_epsilon = LinearSchedule(
            begin_value=spec.exploration_epsilon_begin,
            end_value=spec.exploration_epsilon_end,
            begin_t=int(self._min_replay_capacity * num_action_repeats),
            decay_steps=int(spec.exploration_epsilon_decay_frame_fraction
                            * total_frames))
    self._exploration_epsilon = exploration_epsilon

    self.network = spec.make_network(spec, num_actions)
    if learning_rate is not None:
      import dataclasses
      spec = dataclasses.replace(spec, learning_rate=learning_rate)
    self.optimizer = make_optimizer(spec)

    self._rng_key, init_key = jax.random.split(self._rng_key)
    sample_batch = jnp.asarray(sample_network_input)[None]
    if spec.init_network is not None:
      self.online_params = spec.init_network(spec, self.network, init_key,
                                             sample_batch)
    else:
      self.online_params = self.network.init(init_key, sample_batch)
    self.target_params = self.online_params
    self._opt_state = self.optimizer.init(self.online_params)

    # Replay (flavor from the spec; priority_exponent 0 → uniform).
    encoder = decoder = None
    if compress_state:
      def encoder(tr):
        return tr._replace(
            s_tm1=replay_lib.compress_array(tr.s_tm1),
            s_t=replay_lib.compress_array(tr.s_t))

      def decoder(tr):
        return tr._replace(
            s_tm1=replay_lib.uncompress_array(tr.s_tm1),
            s_t=replay_lib.uncompress_array(tr.s_t))
    structure = replay_lib.Transition(
        s_tm1=None, a_tm1=None, r_t=None, discount_t=None, s_t=None)
    self._prioritized = spec.priority_exponent > 0.0
    if self._prioritized:
      # IS exponent anneals over the INSERT counter (ref replay.py:742-745),
      # one insert per agent-step ⇒ total_frames / num_action_repeats.
      is_schedule = LinearSchedule(
          begin_value=spec.importance_sampling_begin,
          end_value=spec.importance_sampling_end,
          begin_t=0,
          decay_steps=max(1, total_frames // num_action_repeats))
      self._replay = replay_lib.PrioritizedTransitionReplay(
          capacity=replay_capacity, structure=structure,
          priority_exponent=spec.priority_exponent,
          importance_sampling_exponent=is_schedule,
          uniform_sample_probability=spec.uniform_sample_probability,
          normalize_weights=spec.normalize_weights,
          random_state=random_state, encoder=encoder, decoder=decoder)
    else:
      self._replay = replay_lib.TransitionReplay(
          capacity=replay_capacity, structure=structure,
          random_state=random_state, encoder=encoder, decoder=decoder)
    if spec.n_step > 1:
      self._transition_accumulator = replay_lib.NStepTransitionAccumulator(
          spec.n_step)
    else:
      self._transition_accumulator = replay_lib.TransitionAccumulator()

    # Jitted pure functions, defined inline like the reference
    # (dqn/agent.py:81-131, rationale README.md:125-128); both return a
    # fresh PRNG key (README.md:122-124).
    network = self.network
    optimizer = self.optimizer
    agent_spec = self.spec

    def select_action(rng_key, params, s_t, epsilon):
      rng_key, act_key = jax.random.split(rng_key)
      actions, values = agent_spec.act(agent_spec, network, params, act_key,
                                       s_t[None].astype(jnp.uint8),
                                       jnp.asarray(epsilon, jnp.float32))
      return rng_key, actions[0], values[0]

    self._select_action = jax.jit(select_action)

    def update(rng_key, opt_state, online, target, batch, weights):
      rng_key, loss_key = jax.random.split(rng_key)
      def loss_fn(p):
        out = agent_spec.loss(agent_spec, network, p, target, batch,
                              weights, loss_key)
        return out.loss, out.priorities
      (loss, priorities), grads = jax.value_and_grad(
          loss_fn, has_aux=True)(online)
      updates, new_opt_state = optimizer.update(grads, opt_state, online)
      new_online = optax.apply_updates(online, updates)
      return rng_key, new_opt_state, new_online, loss, priorities

    self._update = jax.jit(update)

  # --- reference step skeleton (dqn/agent.py:133-158) -----------------------

  def step(self, timestep: dm_env.TimeStep) -> parts.Action:
    self._frame_t += 1
    ts = self._preprocessor(timestep) if self._preprocessor else timestep
    if ts is None:  # action-repeat frame: repeat the cached action
      if self._action is None:
        raise RuntimeError("Cannot repeat if action has never been selected.")
      action = self._action
    else:
      action = self._action = self._act(ts)
      for transition in self._transition_accumulator.step(ts, action):
        if self._prioritized:
          self._replay.add(transition, priority=self._max_seen_priority)
        else:
          self._replay.add(transition)

    if self._replay.size < self._min_replay_capacity:
      return action
    if self._frame_t % self._learn_period == 0:
      self._learn()
    if self._frame_t % self._target_period == 0:
      self.target_params = self.online_params
    return action

  def _act(self, timestep) -> parts.Action:
    s_t = jnp.asarray(timestep.observation)
    epsilon = self._exploration_epsilon(self._frame_t)
    self._rng_key, a_t, v_t = self._select_action(
        self._rng_key, self.online_params, s_t, epsilon)
    a_t, v_t = jax.device_get((a_t, v_t))
    self._statistics["state_value"] = float(v_t)
    return parts.Action(int(a_t))

  def _learn(self) -> None:
    if self._prioritized:
      transitions, ids, weights = self._replay.sample(self._batch_size)
      weights = jnp.asarray(weights, jnp.float32)
    else:
      transitions = self._replay.sample(self._batch_size)
      ids = None
      weights = jnp.ones((self._batch_size,), jnp.float32)
    batch = transitions._replace(
        s_tm1=jnp.asarray(transitions.s_tm1, jnp.uint8),
        a_tm1=jnp.asarray(transitions.a_tm1, jnp.int32),
        r_t=jnp.asarray(transitions.r_t, jnp.float32),
        discount_t=jnp.asarray(transitions.discount_t, jnp.float32),
        s_t=jnp.asarray(transitions.s_t, jnp.uint8))
    (self._rng_key, self._opt_state, self.online_params, loss,
     priorities) = self._update(self._rng_key, self._opt_state,
                                self.online_params, self.target_params,
                                batch, weights)
    self._statistics["loss"] = float(jax.device_get(loss))
    if self._prioritized:
      priorities = np.asarray(jax.device_get(priorities), np.float64)
      max_priority = float(priorities.max()) if priorities.size else 1.0
      self._max_seen_priority = max(self._max_seen_priority, max_priority)
      self._replay.update_priorities(ids, priorities)

  def reset(self) -> None:
    self._transition_accumulator.reset()
    if self._preprocessor is not None:
      from dqn_zoo_tpu import processors
      processors.reset(self._preprocessor)
    self._action = None

  # --- checkpointable state (ref dqn/agent.py:210-229) ----------------------

  def get_state(self) -> Mapping[str, Any]:
    return {
        "rng_key": self._rng_key,
        "frame_t": self._frame_t,
        "opt_state": self._opt_state,
        "online_params": self.online_params,
        "target_params": self.target_params,
        "replay": self._replay.get_state(),
        "max_seen_priority": self._max_seen_priority,
        # The replay's host RNG: the reference checkpoints it at the runner
        # level (dqn/run_atari.py:102-105, 239-246); here the agent owns it
        # so a state transplant is fully deterministic.
        "random_state": self._random_state.get_state(),
    }

  def set_state(self, state: Mapping[str, Any]) -> None:
    self._rng_key = state["rng_key"]
    self._frame_t = state["frame_t"]
    self._opt_state = jax.device_put(state["opt_state"])
    self.online_params = jax.device_put(state["online_params"])
    self.target_params = jax.device_put(state["target_params"])
    self._replay.set_state(state["replay"])
    self._max_seen_priority = state["max_seen_priority"]
    if "random_state" in state:
      self._random_state.set_state(state["random_state"])

  @property
  def statistics(self) -> Mapping[str, float]:
    return {k: v for k, v in self._statistics.items() if k == "state_value"}
