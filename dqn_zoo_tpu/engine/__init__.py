from dqn_zoo_tpu.engine.superstep import (Engine, EngineConfig, EngineState,
                                          EvalState, Metrics)
