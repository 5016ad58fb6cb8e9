"""IQN implicit quantile networks (Dabney et al. 2018).

Parity: ref iqn/agent.py:178-214 (quantile q-learning on sampled-τ
distributions, TARGET-net selector, Huber κ=1), 64 τ samples each for
policy/s_tm1/s_t, latent dim 64, uniform replay, Adam lr 5e-5, min fill 2%,
eval ε 0.001 (iqn/run_atari.py:97-100 and flag defaults).
"""

import jax
import jax.numpy as jnp

from dqn_zoo_tpu import nets, ops
from dqn_zoo_tpu.agents.base import AgentSpec, LossOutput, register_agent

def iqn_loss(spec, network, online_params, target_params, batch, weights,
             key):
  b = batch.a_tm1.shape[0]
  key, k_tm1, k_sel, k_t = jax.random.split(key, 4)
  tau_tm1 = jax.random.uniform(k_tm1, (b, spec.tau_samples_s_tm1))
  tau_sel = jax.random.uniform(k_sel, (b, spec.tau_samples_policy))
  tau_t = jax.random.uniform(k_t, (b, spec.tau_samples_s_t))
  _, a0, a1, a2 = jax.random.split(key, 4)
  dist_q_tm1 = network.apply(
      online_params, a0, nets.IqnInputs(batch.s_tm1, tau_tm1)).q_dist
  # One target apply on s_t with the selector and target τs concatenated:
  # the per-τ head is independent per sample, so this is exactly the two
  # applies of ref iqn/agent.py:188-198 with the s_t conv torso run once.
  dist_both = network.apply(
      target_params, a1,
      nets.IqnInputs(batch.s_t,
                     jnp.concatenate([tau_sel, tau_t], axis=1))).q_dist
  del a2  # consumed by the fused apply above; kept to preserve key layout
  dist_q_sel = dist_both[:, :spec.tau_samples_policy]
  dist_q_target = dist_both[:, spec.tau_samples_policy:]
  losses = ops.batch_quantile_q_learning(
      dist_q_tm1, tau_tm1, batch.a_tm1, batch.r_t, batch.discount_t,
      dist_q_sel, dist_q_target, spec.huber_param)
  return LossOutput(loss=jnp.mean(losses * weights),
                    priorities=jnp.abs(losses))


def iqn_act(spec, network, params, key, obs, epsilon):
  b = obs.shape[0]
  tau_key, apply_key, policy_key = jax.random.split(key, 3)
  taus = jax.random.uniform(tau_key, (b, spec.tau_samples_policy))
  q = network.apply(params, apply_key, nets.IqnInputs(obs, taus)).q_values
  actions = ops.epsilon_greedy_sample(policy_key, q, epsilon)
  return actions, jnp.max(q, axis=-1)


def _init_network(spec, module, key, sample_obs):
  taus = jnp.zeros((sample_obs.shape[0], spec.tau_samples_s_tm1), jnp.float32)
  return module.init(key, nets.IqnInputs(sample_obs, taus))


SPEC = register_agent(AgentSpec(
    name="iqn",
    make_network=lambda spec, n: nets.iqn_atari_network(
        n, spec.tau_latent_dim, compute_dtype=spec.compute_dtype),
    loss=iqn_loss,
    act=iqn_act,
    init_network=_init_network,
    exploration_epsilon_end=0.01,
    eval_exploration_epsilon=0.001,
    min_replay_capacity_fraction=0.02,
    optimizer="adam",
    learning_rate=0.00005,
    optimizer_epsilon=0.01 / 32,
))
