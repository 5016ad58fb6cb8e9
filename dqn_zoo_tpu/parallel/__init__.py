from dqn_zoo_tpu.parallel.distributed import (DistributedTrainer, DistState,
                                              make_mesh)
