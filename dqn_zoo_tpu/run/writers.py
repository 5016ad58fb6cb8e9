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

  def close(self) -> None:
    pass

  def get_state(self) -> Mapping[str, Any]:
    return {
        "header_written": self._header_written,
        "fieldnames": self._fieldnames,
    }

  def set_state(self, state: Mapping[str, Any]) -> None:
    self._header_written = state["header_written"]
    self._fieldnames = state["fieldnames"]


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
