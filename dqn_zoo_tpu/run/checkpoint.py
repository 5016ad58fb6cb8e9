"""Checkpointing.

The reference ships only an interface stub (NullCheckpoint,
parts.py:496-527) and tells users to plug in a real implementation
(README.md:129-131). Here OrbaxCheckpoint persists the FULL training state —
params, optimizer, device replay (frames + sum trees), env state, RNG,
counters, telemetry — so a restored run is step-identical, satisfying the
reference's determinism contract (README.md:201-210).
"""

from __future__ import annotations

import os
from typing import Any, Mapping, Tuple

import jax
import numpy as np


class NullCheckpoint:
  """No-op checkpoint (ref parts.py:496-527)."""

  def can_be_restored(self) -> bool:
    return False

  def save(self, state, iteration, writer_state, train_done: int = 0,
           extras=None) -> None:
    del state, iteration, writer_state, train_done, extras

  def restore(self, template):
    raise RuntimeError("Nothing to restore.")

  def restore_extras(self):
    return {}


class OrbaxCheckpoint:
  """Single-slot orbax checkpoint of (engine state, iteration, writer)."""

  def __init__(self, path: str):
    import orbax.checkpoint as ocp
    self._path = os.path.abspath(path)
    self._checkpointer = ocp.StandardCheckpointer()
    self._meta_path = os.path.join(self._path, "meta.npz")

  @property
  def _state_path(self) -> str:
    return os.path.join(self._path, "state")

  def can_be_restored(self) -> bool:
    return os.path.exists(self._meta_path)

  def save(self, state, iteration: int, writer_state: Mapping[str, Any],
           train_done: int = 0,
           extras: Mapping[str, float] | None = None) -> None:
    # Orbax writes atomically (tmp dir + rename) and asynchronously; force
    # overwrites the previous slot and wait makes the meta file the commit
    # point (it is written only after the state is durable). The state is
    # passed AS-IS (no global device_get): orbax serializes sharded
    # jax.Arrays natively, each process writing only its addressable shards
    # — a host gather of non-addressable shards would fail on a real
    # multi-host mesh.
    #
    # train_done: supersteps already completed inside `iteration`'s train
    # phase — lets a resumed run continue MID-iteration. Needed because the
    # hosted runtime revokes the TPU lease ~5-7 min after claim
    # (FAILED_PRECONDITION; round-3 breakout chain died 5/5 inside its first
    # 2M-frame train phase with no save point — see VERDICT.md round 3 #1).
    #
    # extras: small scalars that must survive even when their containing
    # subtree is stripped from `state` — e.g. the replay insert counter
    # and max-seen priority under --checkpoint_replay=false, which drive
    # the PER importance-sampling anneal (engine/superstep.py) and insert
    # priorities; without them every replay-less resume rewound the IS
    # exponent to its begin value (round-4 advisor finding, ADVICE.md).
    self._checkpointer.save(self._state_path, state, force=True)
    self._checkpointer.wait_until_finished()
    os.makedirs(self._path, exist_ok=True)
    tmp = self._meta_path + ".tmp.npz"
    extra_kv = {f"x_{k}": np.asarray(v) for k, v in (extras or {}).items()}
    np.savez(tmp, iteration=iteration, train_done=train_done,
             header_written=writer_state.get("header_written", False),
             fieldnames=np.asarray(writer_state.get("fieldnames") or [],
                                   dtype=object),
             rows_written=int(writer_state.get("rows_written", -1)),
             **extra_kv)
    os.replace(tmp, self._meta_path)

  def restore(self, template) -> Tuple[Any, int, Mapping[str, Any], int]:
    # Abstract template: each leaf restores straight onto the template
    # leaf's sharding (replicated/sharded alike), so restore is also
    # multi-host safe — no host round-trip, no device_put broadcast.
    def as_abstract(x):
      if isinstance(x, jax.Array):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
      return x

    abstract = jax.tree_util.tree_map(as_abstract, template)
    state = self._checkpointer.restore(self._state_path, abstract)
    meta = np.load(self._meta_path, allow_pickle=True)
    fieldnames = list(meta["fieldnames"]) or None
    writer_state = {
        "header_written": bool(meta["header_written"]),
        "fieldnames": fieldnames,
    }
    if "rows_written" in meta and int(meta["rows_written"]) >= 0:
      writer_state["rows_written"] = int(meta["rows_written"])
    train_done = int(meta["train_done"]) if "train_done" in meta else 0
    return state, int(meta["iteration"]), writer_state, train_done

  def restore_extras(self) -> Mapping[str, float]:
    """Scalars saved via `extras=` (empty dict for older checkpoints)."""
    meta = np.load(self._meta_path, allow_pickle=True)
    return {k[2:]: float(meta[k]) for k in meta.files if k.startswith("x_")}
