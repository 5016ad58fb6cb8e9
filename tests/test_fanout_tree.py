"""Fanout tree: differential vs the binary sum tree and a naive model."""

import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu.replay import fanout_tree as ft
from dqn_zoo_tpu.replay import sum_tree as st


def test_basic_set_total_get():
  tree = ft.fanout_init(1000)
  tree = ft.fanout_set(tree, jnp.array([0, 999, 57]),
                       jnp.array([1.0, 2.0, 4.0]))
  np.testing.assert_allclose(ft.fanout_total(tree), 7.0)
  np.testing.assert_allclose(ft.fanout_get(tree, jnp.array([999, 1])),
                             [2.0, 0.0])


def test_query_matches_binary_tree():
  rng = np.random.RandomState(0)
  cap = 512
  leaves = rng.rand(cap).astype(np.float32)
  leaves[rng.rand(cap) < 0.5] = 0.0
  btree = st.sum_tree_set(st.sum_tree_init(cap), jnp.arange(cap),
                          jnp.asarray(leaves))
  ftree = ft.fanout_set(ft.fanout_init(cap), jnp.arange(cap),
                        jnp.asarray(leaves))
  total = float(leaves.sum())
  targets = jnp.asarray(rng.rand(500).astype(np.float32) * total)
  got_b = np.asarray(st.sum_tree_query(btree, targets))
  got_f = np.asarray(ft.fanout_query(ftree, targets))
  np.testing.assert_array_equal(got_b, got_f)


def test_query_distribution():
  cap = 300
  probs = np.zeros(cap, np.float32)
  probs[[7, 100, 299]] = [0.25, 0.5, 0.25]
  tree = ft.fanout_set(ft.fanout_init(cap), jnp.arange(cap),
                       jnp.asarray(probs))
  targets = jax.random.uniform(jax.random.PRNGKey(0), (20000,)) * \
      ft.fanout_total(tree)
  leaves = np.asarray(ft.fanout_query(tree, targets))
  counts = np.bincount(leaves, minlength=cap) / len(leaves)
  np.testing.assert_allclose(counts[[7, 100, 299]], [0.25, 0.5, 0.25],
                             atol=0.02)
  assert counts.sum() == 1.0
  others = np.delete(counts, [7, 100, 299])
  assert others.sum() == 0


def test_deep_tree():
  cap = 128**2 + 5  # forces depth 3
  tree = ft.fanout_init(cap)
  assert ft.fanout_capacity(tree) == 128**3
  idxs = jnp.array([0, 128**2 + 4, 128**2])
  tree = ft.fanout_set(tree, idxs, jnp.array([1.0, 1.0, 2.0]))
  np.testing.assert_allclose(ft.fanout_total(tree), 4.0)
  q = ft.fanout_query(tree, jnp.array([0.5, 1.5, 3.5]))
  np.testing.assert_array_equal(q, [0, 128**2, 128**2 + 4])
