"""Small pytree helpers."""

from __future__ import annotations

import dataclasses
from typing import Any


def tree_replace(obj: Any, **updates) -> Any:
  """dataclasses.replace that also works on NamedTuples."""
  if dataclasses.is_dataclass(obj):
    return dataclasses.replace(obj, **updates)
  if hasattr(obj, "_replace"):
    return obj._replace(**updates)
  raise TypeError(f"Cannot replace fields on {type(obj)}")
