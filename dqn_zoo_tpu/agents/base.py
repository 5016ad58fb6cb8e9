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


# loss(spec, network, online_params, target_params, batch, weights, key)
#   -> LossOutput
LossFn = Callable[..., LossOutput]
# act(spec, network, params, key, obs_u8, epsilon) -> (actions (B,), values)
ActFn = Callable[..., Tuple[jax.Array, jax.Array]]


@dataclasses.dataclass(frozen=True)
class AgentSpec:
  """All loss/act/network builders receive the (possibly flag-overridden)
  spec as their first argument, so every hyperparameter below — including
  the per-agent loss/net shape parameters — round-trips through
  dataclasses.replace and the run/train.py flag surface (parity with the
  reference's ~25-30 per-runner flags, dqn/run_atari.py:49-95)."""

  name: str
  make_network: Callable[..., Module]  # (spec, num_actions) -> Module
  loss: LossFn
  act: ActFn
  init_network: Optional[Callable[..., Any]] = None  # (spec, module, key, obs)

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

  # Loss / network hyperparameters (per-agent meaning; reference flag
  # defaults from the matching run_atari.py).
  grad_error_bound: float = 1.0 / 32  # dqn-family TD-error clip
  vmax: float = 10.0  # c51/rainbow support half-width
  num_atoms: int = 51  # c51/rainbow
  num_quantiles: int = 201  # qrdqn
  huber_param: float = 1.0  # qrdqn/iqn
  tau_latent_dim: int = 64  # iqn cosine-embedding dim
  tau_samples_policy: int = 64  # iqn
  tau_samples_s_tm1: int = 64  # iqn
  tau_samples_s_t: int = 64  # iqn
  noisy_weight_init: float = 0.1  # rainbow


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
