"""C51 categorical DQN (Bellemare et al. 2017).

Parity: ref c51/agent.py:87-108 (categorical q-learning on shared support,
no TD clip), support linspace(−10,10,51) (c51/run_atari.py:134), Adam
lr 2.5e-4 eps 0.01/32 + global-norm clip 10, eval ε 0.001.
"""

import functools

import jax
import jax.numpy as jnp

from dqn_zoo_tpu import nets, ops
from dqn_zoo_tpu.agents.base import AgentSpec, LossOutput, register_agent
from dqn_zoo_tpu.agents.dqn import epsilon_greedy_act

def support(spec):
  """linspace(−vmax, vmax, num_atoms) (ref c51/run_atari.py:134)."""
  return jnp.linspace(-spec.vmax, spec.vmax, spec.num_atoms)


def c51_loss(spec, network, online_params, target_params, batch, weights,
             key):
  _, online_key, target_key = jax.random.split(key, 3)
  sup = support(spec)
  logits_q_tm1 = network.apply(online_params, online_key,
                               batch.s_tm1).q_logits
  logits_target_t = network.apply(target_params, target_key,
                                  batch.s_t).q_logits
  losses = ops.batch_categorical_q_learning(
      sup, logits_q_tm1, batch.a_tm1, batch.r_t, batch.discount_t, sup,
      logits_target_t)
  return LossOutput(loss=jnp.mean(losses * weights),
                    priorities=jnp.abs(losses))


SPEC = register_agent(AgentSpec(
    name="c51",
    make_network=lambda spec, n: nets.c51_atari_network(
        n, support(spec), compute_dtype=spec.compute_dtype),
    loss=c51_loss,
    act=epsilon_greedy_act,
    exploration_epsilon_end=0.01,
    eval_exploration_epsilon=0.001,
    optimizer="adam",
    learning_rate=0.00025,
    optimizer_epsilon=0.01 / 32,
    max_global_grad_norm=10.0,
))
