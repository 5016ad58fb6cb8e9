from dqn_zoo_tpu.agents.base import (AgentSpec, LossOutput, get_agent,
                                     all_agent_names, make_optimizer)
