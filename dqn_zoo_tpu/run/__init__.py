from dqn_zoo_tpu.run.atari_data import (ATARI_GAMES,
                                        get_human_normalized_score)
from dqn_zoo_tpu.run.writers import CsvWriter, NullWriter
from dqn_zoo_tpu.run.trackers import (EpisodeTracker, StepRateTracker,
                                      make_default_trackers)
