"""dqn_zoo_tpu: a TPU-native actor-learner framework for DQN-family agents.

Capability surface mirrors google-deepmind/dqn_zoo (7 agents, Atari protocol)
but the design is an on-device vectorized actor-learner rather than a
single-stream host loop. See DESIGN.md.
"""

__version__ = "0.1.0"
