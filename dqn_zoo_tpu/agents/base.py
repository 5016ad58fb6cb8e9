"""Agent specification: everything that distinguishes the seven agents.

The reference proves all seven agents share one skeleton and differ only in
(network, loss, act policy, priority rule, replay flavor, hyperparameters) —
see the identical step() bodies across */agent.py. Here that observation is
the architecture: an `AgentSpec` is pure data + three pure functions, and a
single engine (engine/superstep.py) runs any of them.

Hyperparameter defaults are the reference's flag defaults, cited per agent
module. All periods/schedules are in ENVIRONMENT FRAME units like the
reference flags (README.md:136-138); the engine converts to agent-steps.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.nets.core import Module
from dqn_zoo_tpu.replay.device_replay import TransitionBatch


class LossOutput(NamedTuple):
  loss: jax.Array  # scalar
  priorities: jax.Array  # (B,) raw new priorities (ones for uniform agents)


# loss(network, online_params, target_params, batch, weights, key) -> LossOutput
LossFn = Callable[..., LossOutput]
# act(network, params, key, obs_u8, epsilon) -> (actions (B,), values (B,))
ActFn = Callable[..., Tuple[jax.Array, jax.Array]]


@dataclasses.dataclass(frozen=True)
class AgentSpec:
  name: str
  make_network: Callable[..., Module]  # (num_actions, compute_dtype) -> Module
  loss: LossFn
  act: ActFn
  init_network: Optional[Callable[[Module, jax.Array, Any], Any]] = None

  # Replay (ref replay flavors; priority_exponent 0 → uniform replay).
  n_step: int = 1
  min_replay_capacity_fraction: float = 0.05
  priority_exponent: float = 0.0
  uniform_sample_probability: float = 0.0
  importance_sampling_begin: float = 0.0
  importance_sampling_end: float = 0.0
  normalize_weights: bool = True

  # Optimizer.
  optimizer: str = "rmsprop"  # "rmsprop" (centered) or "adam"
  learning_rate: float = 0.00025
  optimizer_epsilon: float = 0.01 / 32**2
  rmsprop_decay: float = 0.95
  max_global_grad_norm: float = 0.0  # 0 → no clipping

  # Exploration / periods (environment frames).
  exploration_epsilon_begin: float = 1.0
  exploration_epsilon_end: float = 0.1
  exploration_epsilon_decay_frame_fraction: float = 0.02
  eval_exploration_epsilon: float = 0.05
  greedy_actor: bool = False  # rainbow: noisy-net exploration, no ε
  compute_dtype: str = "float32"  # "bfloat16" puts convs/matmuls on the MXU
  target_network_update_period: int = int(4e4)
  learn_period: int = 16
  batch_size: int = 32


def make_optimizer(spec: AgentSpec):
  import optax
  if spec.optimizer == "rmsprop":
    opt = optax.rmsprop(learning_rate=spec.learning_rate,
                        decay=spec.rmsprop_decay,
                        eps=spec.optimizer_epsilon, centered=True)
  elif spec.optimizer == "adam":
    opt = optax.adam(learning_rate=spec.learning_rate,
                     eps=spec.optimizer_epsilon)
  else:
    raise ValueError(spec.optimizer)
  if spec.max_global_grad_norm > 0:
    opt = optax.chain(optax.clip_by_global_norm(spec.max_global_grad_norm),
                      opt)
  return opt


_REGISTRY = {}


def register_agent(spec: AgentSpec) -> AgentSpec:
  _REGISTRY[spec.name] = spec
  return spec


def get_agent(name: str) -> AgentSpec:
  from dqn_zoo_tpu.agents import (c51, double_q, dqn, iqn, prioritized,  # noqa
                                  qrdqn, rainbow)
  if name not in _REGISTRY:
    raise KeyError(f"Unknown agent {name!r}; have {sorted(_REGISTRY)}")
  return _REGISTRY[name]


def all_agent_names():
  from dqn_zoo_tpu.agents import (c51, double_q, dqn, iqn, prioritized,  # noqa
                                  qrdqn, rainbow)
  return sorted(_REGISTRY)
