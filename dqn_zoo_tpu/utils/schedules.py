"""Schedules.

Capability parity with the reference's `parts.LinearSchedule`
(/root/reference/dqn_zoo/parts.py:414-430), but expressed as a jittable pure
function of a (possibly traced) step count so it can live inside the
compiled superstep.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def linear_schedule(t, *, begin_value, end_value, begin_t, end_t):
  """Linear interpolation begin_value→end_value over [begin_t, end_t).

  Works on scalars or arrays, traced or concrete. Clamps outside the range.
  """
  t = jnp.asarray(t, dtype=jnp.float32)
  span = float(end_t - begin_t)
  frac = jnp.clip((t - float(begin_t)) / span, 0.0, 1.0)
  return (1.0 - frac) * begin_value + frac * end_value


@dataclasses.dataclass(frozen=True)
class LinearSchedule:
  """Callable schedule object mirroring the reference API."""

  begin_value: float
  end_value: float
  begin_t: int
  end_t: int | None = None
  decay_steps: int | None = None

  def __post_init__(self):
    if (self.end_t is None) == (self.decay_steps is None):
      raise ValueError("Exactly one of end_t, decay_steps must be supplied.")

  @property
  def _end_t(self) -> int:
    return self.end_t if self.end_t is not None else self.begin_t + self.decay_steps

  def __call__(self, t):
    return linear_schedule(
        t,
        begin_value=self.begin_value,
        end_value=self.end_value,
        begin_t=self.begin_t,
        end_t=self._end_t,
    )
