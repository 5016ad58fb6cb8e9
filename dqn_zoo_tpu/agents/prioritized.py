"""Prioritized-replay Double DQN (Schaul et al. 2015, arXiv 1511.05952).

Parity: ref prioritized/agent.py:86-113 (double-Q TD × IS weights,
priorities = |td_error|, max-seen-priority inserts), priority exponent 0.6,
uniform mixture 1e-3, β schedule 0.4→1.0 over training, lr /4 with
eps ×(1/4)² (prioritized/run_atari.py defaults).
"""

from dqn_zoo_tpu import nets
from dqn_zoo_tpu.agents.base import AgentSpec, register_agent
from dqn_zoo_tpu.agents.dqn import epsilon_greedy_act, q_learning_loss

SPEC = register_agent(AgentSpec(
    name="prioritized",
    make_network=lambda spec, n: nets.double_dqn_atari_network(
        n, compute_dtype=spec.compute_dtype),
    loss=q_learning_loss(double_q=True),
    act=epsilon_greedy_act,
    exploration_epsilon_end=0.01,
    eval_exploration_epsilon=0.01,
    target_network_update_period=int(1.2e5),
    learning_rate=0.00025 / 4,
    optimizer_epsilon=(0.01 / 32**2) * (1.0 / 4) ** 2,
    priority_exponent=0.6,
    uniform_sample_probability=1e-3,
    importance_sampling_begin=0.4,
    importance_sampling_end=1.0,
))
