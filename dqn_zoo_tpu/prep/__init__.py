from dqn_zoo_tpu.prep.atari import (
    rgb_to_y,
    resize_bilinear,
    pooled_frame_to_84,
    FrameStackState,
    frame_stack_init,
    frame_stack_update,
    aggregate_rewards,
    aggregate_discounts,
)
from dqn_zoo_tpu.prep.pil_resize import resize_pil_exact
