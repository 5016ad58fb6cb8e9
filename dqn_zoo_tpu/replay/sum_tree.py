"""Device-resident flat-array sum tree.

Capability parity with the reference's host SumTree
(/root/reference/dqn_zoo/replay.py:246-426): power-of-2 capacity, batched
`set`, total, and prefix-sum `query` (root-to-leaf descent,
replay.py:406-426) — but as pure jnp functions over a fixed-shape array so
the whole structure lives in HBM and every op vectorizes over batches of
indices/queries inside jit.

Layout: a `SumTree` is a 1-based heap array of size 2P (P = capacity, power
of two). tree[1] is the root/total; leaves are tree[P + i]; tree[0] is
unused. Capacity is derived from the static array shape, so the structure
is a plain pytree leaf. After a batch of leaf writes the internal levels are
rebuilt bottom-up with log2(P) reshaped pairwise sums — O(P) vector work,
which on TPU is bandwidth-trivial compared to path-walking scatter updates,
and it keeps every shape static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# A SumTree is just a (2P,) float32 array.
SumTree = jax.Array


def capacity_of(tree: SumTree) -> int:
  cap = tree.shape[-1] // 2
  if cap <= 0 or cap & (cap - 1):
    raise ValueError(f"tree length must be 2·(power of 2), got {tree.shape}")
  return cap


def sum_tree_init(capacity: int) -> SumTree:
  if capacity <= 0 or capacity & (capacity - 1):
    raise ValueError(f"capacity must be a positive power of 2, got {capacity}")
  return jnp.zeros((2 * capacity,), jnp.float32)


def _rebuild(tree: SumTree, capacity: int) -> SumTree:
  """Recomputes all internal nodes from the leaves, bottom-up."""
  level = jax.lax.dynamic_slice_in_dim(tree, capacity, capacity)
  size = capacity // 2
  while size >= 1:
    level = level.reshape(-1, 2).sum(axis=1)
    tree = jax.lax.dynamic_update_slice_in_dim(tree, level, size, axis=0)
    size //= 2
  return tree


def sum_tree_set(tree: SumTree, indices: jax.Array,
                 values: jax.Array) -> SumTree:
  """Sets leaves at `indices` (0-based) to `values`; duplicate indices keep
  the last write (jnp scatter semantics). Values must be non-negative."""
  cap = capacity_of(tree)
  tree = tree.at[cap + indices].set(values.astype(jnp.float32))
  return _rebuild(tree, cap)


def sum_tree_set_all(tree: SumTree, leaves: jax.Array) -> SumTree:
  """Replaces the full leaf vector (P,)."""
  cap = capacity_of(tree)
  tree = jax.lax.dynamic_update_slice_in_dim(
      tree, leaves.astype(jnp.float32), cap, axis=0)
  return _rebuild(tree, cap)


def sum_tree_total(tree: SumTree) -> jax.Array:
  return tree[1]


def sum_tree_get(tree: SumTree, indices: jax.Array) -> jax.Array:
  return tree[capacity_of(tree) + indices]


def sum_tree_leaves(tree: SumTree) -> jax.Array:
  cap = capacity_of(tree)
  return jax.lax.dynamic_slice_in_dim(tree, cap, cap)


def sum_tree_query(tree: SumTree, targets: jax.Array) -> jax.Array:
  """Batched prefix-sum query: for each target value t in [0, total), returns
  the smallest leaf index i such that sum(leaves[:i+1]) > t.

  Matches the reference's root-to-leaf descent (replay.py:406-426),
  vectorized: log2(P) gather steps for the whole batch.
  """
  cap = capacity_of(tree)
  depth = cap.bit_length() - 1
  idx = jnp.ones(jnp.shape(targets), dtype=jnp.int32)  # root
  t = jnp.asarray(targets, jnp.float32)

  def body(_, carry):
    idx, t = carry
    left = 2 * idx
    left_sum = tree[left]
    go_right = t >= left_sum
    idx = jnp.where(go_right, left + 1, left)
    t = jnp.where(go_right, t - left_sum, t)
    return idx, t

  idx, _ = jax.lax.fori_loop(0, depth, body, (idx, t))
  return idx - cap
