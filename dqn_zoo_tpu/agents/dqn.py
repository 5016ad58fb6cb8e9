"""DQN (Mnih et al. 2015).

Parity: ref dqn/agent.py:85-131 (loss: vmapped q_learning, TD clip ±1/32
via gradient clipping, L2; ε-greedy actor) and dqn/run_atari.py flag
defaults (RMSProp centered lr 2.5e-4, eps 0.01/32², target period 40k
frames, ε 1.0→0.1 over 2% of training, eval ε 0.05).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dqn_zoo_tpu import nets, ops
from dqn_zoo_tpu.agents.base import AgentSpec, LossOutput, register_agent

def q_learning_loss(double_q: bool = False):
  """Shared by dqn (single-Q) / double_q & prioritized (double-Q)."""

  def loss(spec, network, online_params, target_params, batch, weights, key):
    _, online_key, target_key, sel_key = jax.random.split(key, 4)
    q_tm1 = network.apply(online_params, online_key, batch.s_tm1).q_values
    q_target_t = network.apply(target_params, target_key, batch.s_t).q_values
    if double_q:
      q_t = network.apply(online_params, sel_key, batch.s_t).q_values
      td_errors = ops.batch_double_q_learning(
          q_tm1, batch.a_tm1, batch.r_t, batch.discount_t, q_target_t, q_t)
    else:
      td_errors = ops.batch_q_learning(
          q_tm1, batch.a_tm1, batch.r_t, batch.discount_t, q_target_t)
    clipped = ops.clip_gradient(td_errors, -spec.grad_error_bound,
                                spec.grad_error_bound)
    losses = ops.l2_loss(clipped)
    # `weights` are all-ones for uniform agents; ref prioritized/agent.py:112.
    return LossOutput(loss=jnp.mean(losses * weights),
                      priorities=jnp.abs(td_errors))

  return loss


def epsilon_greedy_act(spec, network, params, key, obs, epsilon):
  del spec
  apply_key, policy_key = jax.random.split(key)
  q = network.apply(params, apply_key, obs).q_values
  actions = ops.epsilon_greedy_sample(policy_key, q, epsilon)
  return actions, jnp.max(q, axis=-1)


SPEC = register_agent(AgentSpec(
    name="dqn",
    make_network=lambda spec, n: nets.dqn_atari_network(
        n, compute_dtype=spec.compute_dtype),
    loss=q_learning_loss(double_q=False),
    act=epsilon_greedy_act,
))
