"""Rainbow (Hessel et al. 2017): C51 + double-Q + dueling + noisy nets +
n-step + prioritized replay.

Parity: ref rainbow/agent.py:86-140 (categorical double-Q on noisy dueling
net, IS-weighted, priorities = clip(|loss|, 0, 100), GREEDY actor — all
exploration from noisy nets), n=3, priority exponent 0.5, β 0.4→1.0,
Adam lr 2.5e-4/4 eps 0.005/32 clip 10, min fill 2%, target period 3.2e4,
eval ε 0 (rainbow/run_atari.py:253-258).
"""

import jax
import jax.numpy as jnp

from dqn_zoo_tpu import nets, ops
from dqn_zoo_tpu.agents.base import AgentSpec, LossOutput, register_agent
from dqn_zoo_tpu.agents.c51 import support

def rainbow_loss(spec, network, online_params, target_params, batch, weights,
                 key):
  _, k0, k1, k2 = jax.random.split(key, 4)
  sup = support(spec)
  logits_q_tm1 = network.apply(online_params, k0, batch.s_tm1).q_logits
  q_t = network.apply(online_params, k1, batch.s_t).q_values
  logits_target_t = network.apply(target_params, k2, batch.s_t).q_logits
  losses = ops.batch_categorical_double_q_learning(
      sup, logits_q_tm1, batch.a_tm1, batch.r_t, batch.discount_t, sup,
      logits_target_t, q_t)
  return LossOutput(loss=jnp.mean(losses * weights),
                    priorities=jnp.clip(jnp.abs(losses), 0.0, 100.0))


def greedy_noisy_act(spec, network, params, key, obs, epsilon):
  """Greedy wrt a fresh noisy-net sample; ε is still honored so the same
  actor serves eval (where rainbow uses ε = 0)."""
  del spec
  apply_key, policy_key = jax.random.split(key)
  q = network.apply(params, apply_key, obs).q_values
  actions = ops.epsilon_greedy_sample(policy_key, q, epsilon)
  return actions, jnp.max(q, axis=-1)


SPEC = register_agent(AgentSpec(
    name="rainbow",
    make_network=lambda spec, n: nets.rainbow_atari_network(
        n, support(spec), spec.noisy_weight_init,
        compute_dtype=spec.compute_dtype),
    loss=rainbow_loss,
    act=greedy_noisy_act,
    greedy_actor=True,  # train-time ε ≡ 0 (noisy-net exploration)
    exploration_epsilon_begin=0.0,
    exploration_epsilon_end=0.0,
    eval_exploration_epsilon=0.0,
    n_step=3,
    min_replay_capacity_fraction=0.02,
    priority_exponent=0.5,
    uniform_sample_probability=1e-3,
    importance_sampling_begin=0.4,
    importance_sampling_end=1.0,
    optimizer="adam",
    learning_rate=0.00025 / 4,
    optimizer_epsilon=0.005 / 32,
    max_global_grad_norm=10.0,
    target_network_update_period=int(3.2e4),
))
