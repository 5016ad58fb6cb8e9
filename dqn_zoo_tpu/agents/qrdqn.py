"""QR-DQN quantile regression DQN (Dabney et al. 2017).

Parity: ref qrdqn/agent.py:88-110 (quantile q-learning, fixed midpoint
quantiles (i+0.5)/201, Huber κ=1, single-Q target), Adam lr 5e-5
eps 0.01/32 + clip 10, eval ε 0.001.
"""

import jax
import jax.numpy as jnp

from dqn_zoo_tpu import nets, ops
from dqn_zoo_tpu.agents.base import AgentSpec, LossOutput, register_agent
from dqn_zoo_tpu.agents.dqn import epsilon_greedy_act

def quantiles(spec):
  """Fixed midpoints (i+0.5)/n (ref qrdqn/run_atari.py:136-137)."""
  n = spec.num_quantiles
  return (jnp.arange(n, dtype=jnp.float32) + 0.5) / n


def qrdqn_loss(spec, network, online_params, target_params, batch, weights,
               key):
  _, online_key, target_key = jax.random.split(key, 3)
  dist_q_tm1 = network.apply(online_params, online_key, batch.s_tm1).q_dist
  dist_q_target_t = network.apply(target_params, target_key,
                                  batch.s_t).q_dist
  taus = jnp.broadcast_to(quantiles(spec),
                          dist_q_tm1.shape[:1] + (spec.num_quantiles,))
  losses = ops.batch_quantile_q_learning(
      dist_q_tm1, taus, batch.a_tm1, batch.r_t, batch.discount_t,
      dist_q_target_t, dist_q_target_t, spec.huber_param)
  return LossOutput(loss=jnp.mean(losses * weights),
                    priorities=jnp.abs(losses))


SPEC = register_agent(AgentSpec(
    name="qrdqn",
    make_network=lambda spec, n: nets.qr_atari_network(
        n, quantiles(spec), compute_dtype=spec.compute_dtype),
    loss=qrdqn_loss,
    act=epsilon_greedy_act,
    exploration_epsilon_end=0.01,
    eval_exploration_epsilon=0.001,
    optimizer="adam",
    learning_rate=0.00005,
    optimizer_epsilon=0.01 / 32,
    max_global_grad_norm=10.0,
))
