"""Host-side run telemetry.

The reference's trackers (parts.py:150-339) consume a per-frame generator;
here the device engine aggregates per-superstep, and these trackers turn
engine metric snapshots into the same reported quantities: mean episode
return over the phase, episode/frame counts, frame rate.
"""

from __future__ import annotations

import timeit
from typing import Any, Mapping, Optional


class EpisodeTracker:
  """Tracks phase-level episode statistics from engine metric deltas."""

  def __init__(self):
    self.reset()

  def reset(self) -> None:
    self._episodes = 0
    self._return_sum = 0.0
    self._frames = 0
    self._last_mean: float = float("nan")

  def update(self, *, episodes: int, return_sum: float, frames: int) -> None:
    self._episodes += episodes
    self._return_sum += return_sum
    self._frames += frames

  def get(self) -> Mapping[str, Any]:
    if self._episodes > 0:
      mean = self._return_sum / self._episodes
    else:
      mean = float("nan")
    return {
        "episode_return": mean,
        "num_episodes": self._episodes,
        "frame_count": self._frames,
    }


class StepRateTracker:
  """Wall-clock frames/sec within a phase (ref parts.py:250-284)."""

  def __init__(self):
    self.reset()

  def reset(self) -> None:
    self._start: Optional[float] = None
    self._frames = 0

  def update(self, frames: int) -> None:
    if self._start is None:
      self._start = timeit.default_timer()
    self._frames += frames

  def get(self) -> Mapping[str, Any]:
    if self._start is None:
      return {"step_rate": float("nan"), "duration": 0.0}
    dur = timeit.default_timer() - self._start
    return {
        "step_rate": self._frames / dur if dur > 0 else float("nan"),
        "duration": dur,
    }


def make_default_trackers():
  return EpisodeTracker(), StepRateTracker()
