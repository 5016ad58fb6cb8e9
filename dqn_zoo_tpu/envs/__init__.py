from dqn_zoo_tpu.envs.api import Game, GroupOutput, get_game, register_game
from dqn_zoo_tpu.envs.vector import VectorAtariEnv, VecEnvState
