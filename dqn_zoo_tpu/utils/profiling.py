"""Profiling helpers.

The reference's only performance telemetry is wall-clock steps/sec
(parts.py:250-284). Here device-level tracing is first-class: wrap any
engine phase in `trace()` to capture an XLA/TPU profile viewable in
TensorBoard or Perfetto, and `phase_timer` gives cheap named wall-clock
aggregation for driver phases.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
  """Captures a jax.profiler device trace for the enclosed block."""
  jax.profiler.start_trace(logdir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class PhaseTimer:
  """Accumulates wall-clock per named phase; blocks on device completion."""

  def __init__(self):
    self.totals = defaultdict(float)
    self.counts = defaultdict(int)

  @contextlib.contextmanager
  def __call__(self, name: str, block_on=None) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
      yield
    finally:
      if block_on is not None:
        jax.block_until_ready(block_on)
      self.totals[name] += time.perf_counter() - t0
      self.counts[name] += 1

  def summary(self) -> dict:
    return {k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / max(1, self.counts[k])}
            for k in self.totals}
