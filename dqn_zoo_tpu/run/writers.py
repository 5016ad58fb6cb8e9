"""Result writers.

CsvWriter mirrors the reference contract (parts.py:443-493): header written
once, append-mode reopen for resume, field-name consistency enforced,
serializable state so a restored run continues the same file cleanly.
"""

from __future__ import annotations

import csv
import os
from typing import Any, Mapping, Optional, Sequence


class CsvWriter:
  """Writes dict rows to CSV, one header, append-friendly, resumable."""

  def __init__(self, fname: str):
    self._fname = fname
    dirname = os.path.dirname(fname)
    if dirname:
      os.makedirs(dirname, exist_ok=True)
    self._header_written = False
    self._fieldnames: Optional[Sequence[str]] = None
    self._rows_written = 0

  def write(self, values: Mapping[str, Any]) -> None:
    if self._fieldnames is None:
      self._fieldnames = list(values.keys())
    if list(values.keys()) != list(self._fieldnames):
      raise ValueError(
          f"Fields changed: {list(values.keys())} vs {self._fieldnames}")
    # Open/close per write so state is always flushed (ref parts.py:468-478).
    with open(self._fname, "a", newline="") as f:
      writer = csv.DictWriter(f, fieldnames=self._fieldnames)
      if not self._header_written:
        writer.writeheader()
        self._header_written = True
      writer.writerow(values)
    self._rows_written += 1

  def close(self) -> None:
    pass

  def get_state(self) -> Mapping[str, Any]:
    return {
        "header_written": self._header_written,
        "fieldnames": self._fieldnames,
        "rows_written": self._rows_written,
    }

  def set_state(self, state: Mapping[str, Any]) -> None:
    self._header_written = state["header_written"]
    self._fieldnames = state["fieldnames"]
    # Resume idempotence: a process can die between writing row i and the
    # checkpoint save that would have recorded it, leaving the file one row
    # ahead of the restored writer state; the resumed run then re-runs that
    # iteration and would append a duplicate. Truncating to the recorded
    # row count makes the (re)write converge to one row per iteration.
    # Older checkpoints without the counter skip this (no truncation).
    if "rows_written" in state:
      self._rows_written = int(state["rows_written"])
      self._truncate_to(self._rows_written)

  def _truncate_to(self, rows: int) -> None:
    if not os.path.exists(self._fname):
      return
    with open(self._fname, "r", newline="") as f:
      lines = f.readlines()
    keep = (1 if self._header_written else 0) + rows
    if len(lines) > keep:
      with open(self._fname, "w", newline="") as f:
        f.writelines(lines[:keep])


class NullWriter:
  """No-op writer (ref parts.py:433-440)."""

  def write(self, values) -> None:
    del values

  def close(self) -> None:
    pass

  def get_state(self):
    return {}

  def set_state(self, state) -> None:
    del state
