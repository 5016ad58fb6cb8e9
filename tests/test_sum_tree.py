"""Differential tests of the device sum tree vs a naive O(n) NumPy model.

Mirrors the reference's NaiveSumTree differential strategy
(/root/reference/dqn_zoo/replay_test.py:1048-1163).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu.replay import sum_tree as st


class NaiveSumTree:

  def __init__(self, capacity):
    self.values = np.zeros(capacity)

  def set(self, idxs, vals):
    for i, v in zip(idxs, vals):
      self.values[i] = v

  @property
  def total(self):
    return self.values.sum()

  def query(self, target):
    acc = 0.0
    for i, v in enumerate(self.values):
      acc += v
      if target < acc:
        return i
    return len(self.values) - 1


def test_set_and_total():
  tree = st.sum_tree_init(8)
  tree = st.sum_tree_set(tree, jnp.array([0, 3, 7]), jnp.array([1.0, 2.0, 4.0]))
  np.testing.assert_allclose(st.sum_tree_total(tree), 7.0)
  np.testing.assert_allclose(st.sum_tree_get(tree, jnp.array([3, 1])),
                             [2.0, 0.0])


def test_query_basic():
  tree = st.sum_tree_init(4)
  tree = st.sum_tree_set(tree, jnp.arange(4), jnp.array([1.0, 0.0, 2.0, 1.0]))
  # prefix sums: [1, 1, 3, 4]
  targets = jnp.array([0.0, 0.5, 1.0, 2.5, 3.0, 3.9])
  expected = [0, 0, 2, 2, 3, 3]
  np.testing.assert_array_equal(st.sum_tree_query(tree, targets), expected)


def test_differential_random_ops():
  rng = np.random.RandomState(0)
  for seed in range(5):
    cap = 64
    tree = st.sum_tree_init(cap)
    naive = NaiveSumTree(cap)
    for _ in range(20):
      k = rng.randint(1, 10)
      idxs = rng.randint(0, cap, size=k)
      # Deduplicate (device scatter takes last write; naive loop also last).
      vals = rng.rand(k).astype(np.float32) * 10
      tree = st.sum_tree_set(tree, jnp.asarray(idxs), jnp.asarray(vals))
      naive.set(idxs, vals)
      np.testing.assert_allclose(st.sum_tree_total(tree), naive.total,
                                 rtol=1e-5)
      targets = rng.rand(7).astype(np.float32) * naive.total
      got = np.asarray(st.sum_tree_query(tree, jnp.asarray(targets)))
      want = [naive.query(t) for t in targets]
      np.testing.assert_array_equal(got, want)


def test_query_respects_distribution():
  cap = 16
  tree = st.sum_tree_init(cap)
  probs = np.zeros(cap)
  probs[[2, 5, 11]] = [0.2, 0.5, 0.3]
  tree = st.sum_tree_set(tree, jnp.arange(cap), jnp.asarray(probs))
  key = jax.random.PRNGKey(0)
  targets = jax.random.uniform(key, (20000,)) * st.sum_tree_total(tree)
  leaves = np.asarray(st.sum_tree_query(tree, targets))
  counts = np.bincount(leaves, minlength=cap) / len(leaves)
  np.testing.assert_allclose(counts[[2, 5, 11]], [0.2, 0.5, 0.3], atol=0.02)
  assert counts[[i for i in range(16) if i not in (2, 5, 11)]].sum() == 0
