"""Host-compat replay tests, mirroring the reference's test strategy.

Differential sum-tree testing under randomized op sequences vs a naive
O(n) model (ref replay_test.py:1048-1163), PER sampling checked by
frequency counting (ref replay_test.py:669-698), invariant checking via
check_valid after every op (ref replay_test.py:129-148), state
serialization round-trips, and n-step accumulator equivalence/flush tests
(ref replay_test.py:264-324).
"""

import copy

import dm_env
import numpy as np
import pytest

from dqn_zoo_tpu.replay import host


# --- naive reference model ---------------------------------------------------


class NaiveSumTree:
  """O(n) model of the sum-tree contract."""

  def __init__(self):
    self.values = np.zeros((0,), np.float64)

  def resize(self, size):
    v = np.zeros((size,), np.float64)
    v[:min(size, len(self.values))] = self.values[:size]
    self.values = v

  def set(self, indices, values):
    for i, x in zip(indices, values):
      self.values[i] = x

  def query(self, targets):
    prefix = np.cumsum(self.values)
    return [int(np.searchsorted(prefix, t, side="right"))
            for t in targets]

  def root(self):
    return self.values.sum() if len(self.values) else np.nan


def test_sum_tree_differential_random_ops():
  for seed in range(10):
    rng = np.random.RandomState(seed)
    tree, naive = host.SumTree(), NaiveSumTree()
    size = 0
    for _ in range(60):
      op = rng.randint(3)
      if op == 0 or size == 0:  # resize
        size = rng.randint(1, 80)
        tree.resize(size)
        naive.resize(size)
      elif op == 1:  # set a random batch (duplicates allowed)
        k = rng.randint(1, 10)
        idx = rng.randint(size, size=k)
        # Make duplicate indices consistent: last write wins in both.
        vals = rng.uniform(0.0, 5.0, size=k)
        dedup = {int(i): float(v) for i, v in zip(idx, vals)}
        tree.set(list(dedup), list(dedup.values()))
        naive.set(list(dedup), list(dedup.values()))
      else:  # query
        if naive.root() and naive.root() > 0:
          targets = rng.uniform(0.0, naive.root() * (1 - 1e-12), size=5)
          assert list(tree.query(targets)) == naive.query(targets)
      ok, msg = tree.check_valid()
      assert ok, msg
      np.testing.assert_allclose(tree.values, naive.values)


def test_sum_tree_state_roundtrip():
  tree = host.SumTree()
  tree.resize(11)
  tree.set([0, 3, 10], [1.0, 2.0, 3.0])
  restored = host.SumTree()
  restored.set_state(copy.deepcopy(tree.get_state()))
  np.testing.assert_array_equal(restored.values, tree.values)
  assert restored.root() == tree.root()
  assert list(restored.query([0.5, 2.9, 5.5])) == [0, 3, 10]


def test_sum_tree_rejects_bad_values():
  tree = host.SumTree()
  tree.resize(4)
  with pytest.raises(ValueError):
    tree.set([0], [-1.0])
  with pytest.raises(IndexError):
    tree.set([4], [1.0])
  with pytest.raises(ValueError):
    tree.query([tree.root() + 1.0])


# --- uniform structures ------------------------------------------------------


def _transition(i):
  return host.Transition(
      s_tm1=np.full((3,), i, np.float32), a_tm1=i, r_t=float(i),
      discount_t=0.9, s_t=np.full((3,), i + 1, np.float32))


def test_transition_replay_fifo_and_sampling():
  rng = np.random.RandomState(0)
  replay = host.TransitionReplay(5, _transition(0), rng)
  for i in range(8):
    replay.add(_transition(i))
    ok, msg = replay.check_valid()
    assert ok, msg
  assert replay.size == 5
  assert list(replay.ids()) == [3, 4, 5, 6, 7]  # FIFO eviction
  batch = replay.sample(64)
  assert batch.a_tm1.shape == (64,)
  assert set(batch.a_tm1.tolist()) <= {3, 4, 5, 6, 7}
  [got] = list(replay.get([4]))
  np.testing.assert_array_equal(got.s_tm1, _transition(4).s_tm1)


def test_transition_replay_state_roundtrip_and_encoder():
  rng = np.random.RandomState(1)
  replay = host.TransitionReplay(
      4, _transition(0), rng,
      encoder=lambda tr: tr._replace(
          s_tm1=host.compress_array(tr.s_tm1)),
      decoder=lambda tr: tr._replace(
          s_tm1=host.uncompress_array(tr.s_tm1)))
  for i in range(6):
    replay.add(_transition(i))
  state = copy.deepcopy(replay.get_state())
  restored = host.TransitionReplay(
      4, _transition(0), np.random.RandomState(1),
      encoder=replay._encoder, decoder=replay._decoder)
  restored.set_state(state)
  assert list(restored.ids()) == list(replay.ids())
  [got] = list(restored.get([5]))
  np.testing.assert_array_equal(got.s_tm1, _transition(5).s_tm1)


def test_uniform_distribution_frequencies():
  rng = np.random.RandomState(2)
  dist = host.UniformDistribution(rng)
  dist.add([10, 20, 30, 40])
  dist.remove([20])
  counts = dict.fromkeys((10, 30, 40), 0)
  n = 9000
  for i in dist.sample(n):
    counts[int(i)] += 1
  for c in counts.values():
    np.testing.assert_allclose(c / n, 1 / 3, atol=0.02)


# --- prioritized structures --------------------------------------------------


def test_prioritized_sampling_frequency_matches_priorities():
  """Sampling frequencies ∝ p^α mixed with uniform (ref
  replay_test.py:669-698 methodology)."""
  alpha, usp = 0.8, 0.1
  rng = np.random.RandomState(3)
  dist = host.PrioritizedDistribution(
      priority_exponent=alpha, uniform_sample_probability=usp,
      random_state=rng, min_capacity=4, max_capacity=4)
  priorities = np.array([0.0, 1.0, 2.0, 3.0])
  dist.add_priorities([0, 1, 2, 3], priorities)
  ok, msg = dist.check_valid()
  assert ok, msg
  n = 40000
  ids, probs = dist.sample(n)
  counts = np.bincount(ids, minlength=4) / n
  pe = np.where(priorities == 0, 0.0, priorities ** alpha)
  expect = (1 - usp) * pe / pe.sum() + usp / 4
  np.testing.assert_allclose(counts, expect, atol=0.02)
  # Reported probabilities must match the analytic mixture per ID.
  for i, p in zip(ids[:100], probs[:100]):
    np.testing.assert_allclose(p, expect[i], rtol=1e-6)


def test_prioritized_zero_priority_unsampleable_at_zero_exponent():
  """0^0 = 0: zero-priority items never sampled proportionally even with
  α = 0 (ref replay.py:203-208)."""
  rng = np.random.RandomState(4)
  dist = host.PrioritizedDistribution(
      priority_exponent=0.0, uniform_sample_probability=0.0,
      random_state=rng, min_capacity=3)
  dist.add_priorities([0, 1, 2], [0.0, 1.0, 1.0])
  ids, _ = dist.sample(2000)
  assert 0 not in set(ids.tolist())


def test_prioritized_all_zero_priorities_falls_back_to_uniform():
  rng = np.random.RandomState(5)
  dist = host.PrioritizedDistribution(
      priority_exponent=0.6, uniform_sample_probability=0.0,
      random_state=rng, min_capacity=2)
  dist.add_priorities([7, 8], [0.0, 0.0])
  ids, probs = dist.sample(500)
  assert set(ids.tolist()) == {7, 8}
  np.testing.assert_allclose(probs, 0.5)


def test_prioritized_capacity_doubling():
  rng = np.random.RandomState(6)
  dist = host.PrioritizedDistribution(
      priority_exponent=1.0, uniform_sample_probability=0.0,
      random_state=rng, min_capacity=2)
  for i in range(9):
    dist.add_priorities([i], [1.0 + i])
    ok, msg = dist.check_valid()
    assert ok, msg
  assert dist.size == 9
  assert dist.capacity >= 9


def test_prioritized_replay_end_to_end():
  rng = np.random.RandomState(7)
  anneal = lambda t: min(1.0, 0.4 + t * 0.01)
  replay = host.PrioritizedTransitionReplay(
      capacity=6, structure=_transition(0), priority_exponent=0.6,
      importance_sampling_exponent=anneal, uniform_sample_probability=1e-3,
      normalize_weights=True, random_state=rng)
  for i in range(10):
    replay.add(_transition(i), priority=float(i % 4) + 0.5)
    ok, msg = replay.check_valid()
    assert ok, msg
  assert replay.size == 6
  # IS exponent is a function of the INSERT counter (ref replay.py:742-745).
  np.testing.assert_allclose(replay.importance_sampling_exponent,
                             anneal(10))
  batch, ids, weights = replay.sample(32)
  assert batch.a_tm1.shape == (32,)
  assert weights.max() == pytest.approx(1.0)
  replay.update_priorities(ids, np.abs(rng.randn(32)) + 0.1)
  state = copy.deepcopy(replay.get_state())
  restored = host.PrioritizedTransitionReplay(
      capacity=6, structure=_transition(0), priority_exponent=0.6,
      importance_sampling_exponent=anneal, uniform_sample_probability=1e-3,
      normalize_weights=True, random_state=np.random.RandomState(7))
  restored.set_state(state)
  ok, msg = restored.check_valid()
  assert ok, msg
  assert list(restored._storage.ids()) == list(replay._storage.ids())


# --- accumulators ------------------------------------------------------------


def _ts(step_type, obs, reward=0.0, discount=1.0):
  return dm_env.TimeStep(step_type=step_type, reward=reward,
                         discount=discount, observation=obs)


def _episode(rewards, discounts):
  """FIRST, then one MID per reward except the last which is LAST."""
  yield _ts(dm_env.StepType.FIRST, 0, reward=None, discount=None), 100
  for k, (r, g) in enumerate(zip(rewards, discounts)):
    st = (dm_env.StepType.LAST if k == len(rewards) - 1
          else dm_env.StepType.MID)
    yield _ts(st, k + 1, reward=r, discount=g), 100 + k + 1


def test_nstep_accumulator_equals_1step_at_n1():
  acc1 = host.TransitionAccumulator()
  accn = host.NStepTransitionAccumulator(1)
  rewards = [1.0, 2.0, 3.0]
  discounts = [0.9, 0.8, 0.0]
  out1, outn = [], []
  for ts, a in _episode(rewards, discounts):
    out1.extend(acc1.step(ts, a))
    outn.extend(accn.step(ts, a))
  assert len(out1) == len(outn) == 3
  for t1, tn in zip(out1, outn):
    assert t1 == tn


def test_nstep_accumulator_episode_end_flush():
  """On LAST, yields the n, n-1, ..., 1-step suffix transitions
  (ref replay.py:873-886)."""
  n = 3
  acc = host.NStepTransitionAccumulator(n)
  rewards = [1.0, 2.0, 4.0, 8.0]
  discounts = [0.5, 0.5, 0.5, 0.0]
  outs = []
  for ts, a in _episode(rewards, discounts):
    outs.extend(acc.step(ts, a))
  # Steps 1..3 fill the deque -> one 3-step transition at t=3 (MID), then
  # LAST at t=4 flushes 3-, 2-, 1-step transitions ending at s_4.
  assert [o.s_tm1 for o in outs] == [0, 1, 2, 3]
  assert all(o.s_t == 4 for o in outs[1:])
  np.testing.assert_allclose(outs[0].r_t, 1 + 0.5 * 2 + 0.25 * 4)
  np.testing.assert_allclose(outs[1].r_t, 2 + 0.5 * 4 + 0.25 * 8)
  np.testing.assert_allclose(outs[2].r_t, 4 + 0.5 * 8)
  np.testing.assert_allclose(outs[3].r_t, 8.0)
  assert outs[1].discount_t == 0.0  # folds the terminal discount
  # New episode resets cleanly.
  outs2 = []
  for ts, a in _episode([1.0], [0.0]):
    outs2.extend(acc.step(ts, a))
  assert len(outs2) == 1 and outs2[0].r_t == 1.0


def test_accumulator_requires_first():
  acc = host.TransitionAccumulator()
  with pytest.raises(ValueError):
    list(acc.step(_ts(dm_env.StepType.MID, 1, 0.0, 1.0), 0))


# --- misc --------------------------------------------------------------------


def test_importance_sampling_weights():
  probs = np.array([0.1, 0.2, 0.4])
  w = host.importance_sampling_weights(probs, uniform_probability=0.25,
                                       exponent=0.5, normalize=False)
  np.testing.assert_allclose(w, (0.25 / probs) ** 0.5)
  wn = host.importance_sampling_weights(probs, 0.25, 0.5, normalize=True)
  assert wn.max() == pytest.approx(1.0)
  with pytest.raises(ValueError):
    host.importance_sampling_weights(probs, 0.25, 1.5, False)


def test_compress_roundtrip():
  # Structured like a game frame (mostly flat background), so it compresses.
  arr = np.zeros((84, 84, 4), np.uint8)
  arr[10:30, 40:60] = 200
  arr[50:52, :, 1] = 90
  packed = host.compress_array(arr)
  assert len(packed[0]) < arr.nbytes  # actually compresses
  np.testing.assert_array_equal(host.uncompress_array(packed), arr)
  # Round-trips arbitrary (incompressible) content too.
  noise = np.random.RandomState(0).randint(0, 255, (7, 5), np.uint8)
  np.testing.assert_array_equal(
      host.uncompress_array(host.compress_array(noise)), noise)
