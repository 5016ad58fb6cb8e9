from dqn_zoo_tpu.ops.value_learning import (
    clip_gradient,
    l2_loss,
    huber_loss,
    q_learning,
    double_q_learning,
    categorical_l2_project,
    categorical_q_learning,
    categorical_double_q_learning,
    quantile_regression_loss,
    quantile_q_learning,
    batch_q_learning,
    batch_double_q_learning,
    batch_categorical_q_learning,
    batch_categorical_double_q_learning,
    batch_quantile_q_learning,
)
from dqn_zoo_tpu.ops.policy import epsilon_greedy_sample, greedy_sample
