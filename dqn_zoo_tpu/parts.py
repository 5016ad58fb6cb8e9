"""Host-side agent/run-loop API, compatible with the reference's parts.py.

The TPU throughput path is engine/superstep.py; this module provides the
reference's *host* capability surface (parts.py:42-527) for users migrating
from dqn_zoo: the Agent ABC, the run_loop generator with episode truncation
and the extra-step-on-LAST convention, generate_statistics with ChainMap
merging, the tracker set, and an EpsilonGreedyActor whose params are set
externally. All of it runs against any dm_env.Environment — including
envs.dm_adapter.JaxGameEnvironment.
"""

from __future__ import annotations

import abc
import collections
import itertools
import timeit
from typing import Any, Iterable, Mapping, Optional, Tuple

import dm_env
import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu import ops
from dqn_zoo_tpu.utils.schedules import LinearSchedule  # re-export  # noqa
from dqn_zoo_tpu.run.writers import CsvWriter, NullWriter  # re-export  # noqa

Action = int


class Agent(abc.ABC):
  """Agent interface (ref parts.py:42-67)."""

  @abc.abstractmethod
  def step(self, timestep: dm_env.TimeStep) -> Action:
    """Selects an action given a timestep, potentially learning."""

  @abc.abstractmethod
  def reset(self) -> None:
    """Resets episodic state; called at the start of every episode."""

  @abc.abstractmethod
  def get_state(self) -> Mapping[str, Any]:
    ...

  @abc.abstractmethod
  def set_state(self, state: Mapping[str, Any]) -> None:
    ...

  @property
  @abc.abstractmethod
  def statistics(self) -> Mapping[str, float]:
    ...


def run_loop(agent: Agent, environment: dm_env.Environment,
             max_steps_per_episode: int = 0, yield_before_reset: bool = False
             ) -> Iterable[Tuple[dm_env.Environment,
                                 Optional[dm_env.TimeStep],
                                 Agent, Optional[Action]]]:
  """Infinite generator alternating agent and environment steps.

  Reference semantics (parts.py:70-122): episode truncation rewrites the
  step type to LAST at max_steps_per_episode; the agent takes one extra
  step on LAST (so the terminal transition is learned from) whose action is
  discarded; optional yield before each reset for per-episode hooks.
  """
  while True:
    if yield_before_reset:
      yield environment, None, agent, None

    t = 0
    agent.reset()
    timestep_t = environment.reset()

    while True:
      if max_steps_per_episode > 0 and t >= max_steps_per_episode:
        timestep_t = timestep_t._replace(step_type=dm_env.StepType.LAST)

      a_t = agent.step(timestep_t)
      yield environment, timestep_t, agent, a_t

      a_tm1 = a_t
      t += 1
      if timestep_t.last():
        break  # the LAST timestep was just processed; start a new episode
      timestep_t = environment.step(a_tm1)


def generate_statistics(trackers, timestep_action_sequence
                        ) -> Mapping[str, Any]:
  """Feeds every generator item to every tracker, merges their outputs
  (ref parts.py:125-147)."""
  for tracker in trackers:
    tracker.reset()
  for environment, timestep_t, agent, a_t in timestep_action_sequence:
    for tracker in trackers:
      tracker.step(environment, timestep_t, agent, a_t)
  return dict(collections.ChainMap(*(t.get() for t in trackers)))


class EpisodeTracker:
  """Mean/current episode return, episode & step counts (parts.py:150-247)."""

  def __init__(self):
    self.reset()

  def reset(self) -> None:
    self._num_steps_since_reset = 0
    self._num_steps_over_episodes = 0
    self._episode_returns = []
    self._current_episode_rewards = []
    self._current_episode_step = 0

  def step(self, environment, timestep_t, agent, a_t) -> None:
    del environment, agent, a_t
    if timestep_t is None:
      return
    if timestep_t.first():
      if self._current_episode_rewards:
        raise ValueError("Expected no rewards pending at FIRST.")
      self._current_episode_step = 0
      self._current_episode_rewards = []
    else:
      self._current_episode_rewards.append(timestep_t.reward)
    self._num_steps_since_reset += 1
    self._current_episode_step += 1
    if timestep_t.last():
      self._episode_returns.append(sum(self._current_episode_rewards))
      self._current_episode_rewards = []
      self._num_steps_over_episodes += self._current_episode_step
      self._current_episode_step = 0

  def get(self) -> Mapping[str, Any]:
    if self._episode_returns:
      mean_return = float(np.mean(self._episode_returns))
      current_return = sum(self._current_episode_rewards)
    elif self._num_steps_since_reset > 0:
      mean_return = sum(self._current_episode_rewards)
      current_return = mean_return
    else:
      mean_return = np.nan
      current_return = np.nan
    return {
        "episode_return": mean_return,
        "current_episode_return": current_return,
        "num_episodes": len(self._episode_returns),
        "num_steps_over_episodes": self._num_steps_over_episodes,
        "current_episode_step": self._current_episode_step,
        "num_steps_since_reset": self._num_steps_since_reset,
    }


class StepRateTracker:
  """steps/sec + duration (parts.py:250-284)."""

  def __init__(self):
    self.reset()

  def reset(self) -> None:
    self._num_steps_since_reset = 0
    self._start = timeit.default_timer()

  def step(self, environment, timestep_t, agent, a_t) -> None:
    del environment, timestep_t, agent, a_t
    self._num_steps_since_reset += 1

  def get(self) -> Mapping[str, Any]:
    duration = timeit.default_timer() - self._start
    if self._num_steps_since_reset > 0:
      rate = self._num_steps_since_reset / duration
    else:
      rate = np.nan
    return {"step_rate": rate, "num_steps": self._num_steps_since_reset,
            "duration": duration}


class UnbiasedExponentialWeightedAverageAgentTracker:
  """EWMA of agent statistics with bias correction (parts.py:287-329)."""

  def __init__(self, step_size: float, initial_agent: Agent):
    self._step_size = step_size
    self.trace = 0.0
    self._statistics = dict(initial_agent.statistics)

  def reset(self) -> None:
    self.trace = 0.0
    self._statistics = {k: np.nan for k in self._statistics}

  def step(self, environment, timestep_t, agent, a_t) -> None:
    del environment, timestep_t, a_t
    s = self._step_size
    final_trace = (1 - s) * self.trace + s
    self._statistics = {
        k: ((1 - s) * self.trace * _nan_to_zero(self._statistics[k])
            + s * v) / final_trace
        for k, v in agent.statistics.items()
    }
    self.trace = final_trace

  def get(self) -> Mapping[str, float]:
    return dict(self._statistics)


def _nan_to_zero(x):
  return 0.0 if x != x else x


def make_default_trackers(initial_agent: Agent):
  return [
      EpisodeTracker(),
      StepRateTracker(),
      UnbiasedExponentialWeightedAverageAgentTracker(
          step_size=1e-3, initial_agent=initial_agent),
  ]


class EpsilonGreedyActor(Agent):
  """Eval actor: ε-greedy over a network's Q-values, params set externally
  (ref parts.py:342-411). Works with our host preprocessor and any network
  module whose outputs expose q_values."""

  def __init__(self, preprocessor, network, exploration_epsilon: float,
               rng_key):
    self._preprocessor = preprocessor
    self._rng_key = rng_key
    self._action = None
    self.network_params = None

    def select_action(rng_key, params, s_t):
      rng_key, apply_key, policy_key = jax.random.split(rng_key, 3)
      q_t = network.apply(params, apply_key, s_t[None, ...]).q_values[0]
      a_t = ops.epsilon_greedy_sample(policy_key, q_t[None, :],
                                      exploration_epsilon)[0]
      return rng_key, a_t

    self._select_action = jax.jit(select_action)

  def step(self, timestep: dm_env.TimeStep) -> Action:
    timestep = self._preprocessor(timestep)
    if timestep is None:
      if self._action is None:
        raise RuntimeError("Cannot repeat if action has never been selected.")
      return self._action
    s_t = timestep.observation
    self._rng_key, a_t = self._select_action(
        self._rng_key, self.network_params, jnp.asarray(s_t))
    self._action = Action(int(jax.device_get(a_t)))
    return self._action

  def reset(self) -> None:
    from dqn_zoo_tpu import processors
    processors.reset(self._preprocessor)
    self._action = None

  def get_state(self) -> Mapping[str, Any]:
    return {"rng_key": self._rng_key, "network_params": self.network_params}

  def set_state(self, state) -> None:
    self._rng_key = state["rng_key"]
    self.network_params = state["network_params"]

  @property
  def statistics(self) -> Mapping[str, float]:
    return {}
