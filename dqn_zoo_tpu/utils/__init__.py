from dqn_zoo_tpu.utils.schedules import LinearSchedule, linear_schedule
from dqn_zoo_tpu.utils.pytree import tree_replace
