"""Double DQN (van Hasselt et al. 2015).

Parity: ref double_q/agent.py:37,97-104 (double-Q loss, TD clip, L2) with
the shared-bias final layer (double_q/run_atari.py → networks.py:338-349),
ε end 0.01, eval ε 0.01, target period 1.2e5 frames.
"""

from dqn_zoo_tpu import nets
from dqn_zoo_tpu.agents.base import AgentSpec, register_agent
from dqn_zoo_tpu.agents.dqn import epsilon_greedy_act, q_learning_loss

SPEC = register_agent(AgentSpec(
    name="double_q",
    make_network=lambda spec, n: nets.double_dqn_atari_network(
        n, compute_dtype=spec.compute_dtype),
    loss=q_learning_loss(double_q=True),
    act=epsilon_greedy_act,
    exploration_epsilon_end=0.01,
    eval_exploration_epsilon=0.01,
    target_network_update_period=int(1.2e5),
))
