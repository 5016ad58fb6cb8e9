"""Policy sampling ops (the distrax surface the reference uses).

`distrax.EpsilonGreedy(q, eps).sample(...)` semantics
(ref dqn/agent.py:121-129): the action distribution is
ε/A uniform + (1−ε) on the argmax (ties broken by first argmax), sampled
categorically. Vectorized over a batch of Q-value rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy_sample(q_values):
  """Greedy action per row; ties break to the lowest index like argmax."""
  return jnp.argmax(q_values, axis=-1).astype(jnp.int32)


def epsilon_greedy_sample(key, q_values, epsilon):
  """Samples ε-greedy actions. q_values (..., A); epsilon scalar or (...)."""
  num_actions = q_values.shape[-1]
  greedy = jnp.argmax(q_values, axis=-1)
  explore_key, uniform_key = jax.random.split(key)
  uniform = jax.random.randint(uniform_key, greedy.shape, 0, num_actions)
  explore = (jax.random.uniform(explore_key, greedy.shape)
             < jnp.asarray(epsilon))
  return jnp.where(explore, uniform, greedy).astype(jnp.int32)
