# Host-compat replay surface (reference dqn_zoo/replay.py API):
# `from dqn_zoo_tpu.replay import host` — Transition, TransitionReplay,
# PrioritizedTransitionReplay, SumTree, UniformDistribution, accumulators,
# importance_sampling_weights, compress_array/uncompress_array.
from dqn_zoo_tpu.replay import host
from dqn_zoo_tpu.replay.sum_tree import (
    SumTree,
    sum_tree_init,
    sum_tree_set,
    sum_tree_total,
    sum_tree_query,
    sum_tree_get,
)
from dqn_zoo_tpu.replay.device_replay import (
    ReplayConfig,
    ReplayState,
    TransitionBatch,
    replay_init,
    replay_insert,
    replay_sample,
    replay_update_priorities,
    replay_size,
    importance_sampling_weights,
)
