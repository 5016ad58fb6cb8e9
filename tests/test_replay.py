"""Device replay tests.

Coverage mirrors the reference's replay_test.py strategy: sampling
distribution by frequency counting (replay_test.py:669-698), n-step
accumulator semantics incl. episode-end flush (replay_test.py:282-324), and
state round-trips via pytree identity.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_zoo_tpu import replay as rp

F = 6  # tiny frames for test speed


def make_cfg(**kw):
  defaults = dict(num_streams=2, slots_per_stream=16, n_step=1, stack_size=4,
                  frame_size=F, priority_exponent=0.0,
                  uniform_sample_probability=0.0)
  defaults.update(kw)
  return rp.ReplayConfig(**defaults)


def frame_of(step, stream=0):
  """Deterministic distinguishable frame content."""
  return np.full((F, F), (stream * 100 + step) % 256, np.uint8)


def insert_rows(cfg, state, rows):
  """rows: list of dicts with per-stream arrays."""
  for r in rows:
    state = rp.replay_insert(
        cfg, state,
        frame=jnp.asarray(r["frame"]),
        stack_count=jnp.asarray(r["stack_count"], jnp.int32),
        action=jnp.asarray(r["action"], jnp.int32),
        reward=jnp.asarray(r["reward"], jnp.float32),
        discount=jnp.asarray(r["discount"], jnp.float32),
        is_terminal=jnp.asarray(r["is_terminal"]),
    )
  return state


def simple_episode(cfg, length, start_step=0, stream_count=None):
  """Builds rows for one episode running on all streams in lockstep."""
  s = cfg.num_streams
  rows = []
  for i in range(length):
    step = start_step + i
    rows.append(dict(
        frame=np.stack([frame_of(step, j) for j in range(s)]),
        stack_count=[min(i + 1, cfg.stack_size)] * s,
        action=[step % 4] * s,
        reward=[float(step)] * s,
        discount=[0.99 if i < length - 1 else 0.0] * s,
        is_terminal=[i == length - 1] * s,
    ))
  return rows


def test_size_grows_with_activation_1step():
  cfg = make_cfg(n_step=1)
  state = rp.replay_init(cfg)
  rows = simple_episode(cfg, 6)
  # After k inserts, rows 0..k-2 are active (1-step future needed), per stream
  for i, r in enumerate(rows):
    state = insert_rows(cfg, state, [r])
    expected = max(0, i) * cfg.num_streams  # i rows have a successor
    if i == len(rows) - 1:
      expected = (len(rows) - 1) * cfg.num_streams  # terminal row never active
    assert int(rp.replay_size(state)) == expected, f"at insert {i}"


def test_terminal_row_never_sampled():
  cfg = make_cfg(n_step=1)
  state = rp.replay_init(cfg)
  state = insert_rows(cfg, state, simple_episode(cfg, 5))
  state = insert_rows(cfg, state, simple_episode(cfg, 5, start_step=5))
  batch, leaves, _ = rp.replay_sample(cfg, state, jax.random.PRNGKey(0), 256)
  slots = np.asarray(leaves) % cfg.slots_per_stream
  term = np.asarray(state.is_terminal).reshape(-1)[np.asarray(leaves)]
  assert not term.any()


def test_one_step_transition_contents():
  cfg = make_cfg(n_step=1, num_streams=1)
  state = rp.replay_init(cfg)
  state = insert_rows(cfg, state, simple_episode(cfg, 6))
  batch, leaves, _ = rp.replay_sample(cfg, state, jax.random.PRNGKey(1), 64)
  k = np.asarray(state.row_t).reshape(-1)[np.asarray(leaves)]
  # r_t must equal the reward of row k+1 (reward received at next step)
  np.testing.assert_allclose(np.asarray(batch.r_t), k + 1.0)
  # discount: 0.99 for non-terminal next rows, 0 at terminal (row 5)
  want_disc = np.where(k + 1 == 5, 0.0, 0.99)
  np.testing.assert_allclose(np.asarray(batch.discount_t), want_disc,
                             rtol=1e-6)
  # newest channel of s_tm1 equals frame_of(k); oldest channels zero-padded
  counts = np.minimum(k + 1, 4)
  for b in range(len(k)):
    c = counts[b]
    stack = np.asarray(batch.s_tm1[b])
    assert stack[0, 0, c - 1] == frame_of(k[b])[0, 0]
    if c < 4:
      assert (stack[..., c:] == 0).all()
    # s_t is the stack of k+1
    c2 = np.minimum(k[b] + 2, 4)
    np.testing.assert_array_equal(
        np.asarray(batch.s_t[b])[..., c2 - 1],
        frame_of(k[b] + 1))


def test_nstep_fold_matches_reference_math():
  cfg = make_cfg(n_step=3, num_streams=1, slots_per_stream=32)
  state = rp.replay_init(cfg)
  L = 10
  state = insert_rows(cfg, state, simple_episode(cfg, L))
  batch, leaves, _ = rp.replay_sample(cfg, state, jax.random.PRNGKey(2), 128)
  k = np.asarray(state.row_t).reshape(-1)[np.asarray(leaves)]
  rewards = np.arange(L, dtype=np.float64)
  discounts = np.where(np.arange(L) < L - 1, 0.99, 0.0)
  for b in range(len(k)):
    m_star = min(3, (L - 1) - k[b])
    r, cd = 0.0, 1.0
    for m in range(1, m_star + 1):
      r += cd * rewards[k[b] + m]
      cd *= discounts[k[b] + m]
    np.testing.assert_allclose(batch.r_t[b], r, rtol=1e-5)
    np.testing.assert_allclose(batch.discount_t[b], cd, rtol=1e-5, atol=1e-7)


def test_nstep_flush_activates_suffix_rows():
  """On terminal insert, rows t-1..t-(n-1) become sampleable immediately —
  the reference's episode-end suffix flush (replay.py:873-886)."""
  cfg = make_cfg(n_step=3, num_streams=1, slots_per_stream=32)
  state = rp.replay_init(cfg)
  L = 6
  rows = simple_episode(cfg, L)
  state = insert_rows(cfg, state, rows[:-1])
  # before terminal: only rows with full 3-step future are active: rows 0..1
  assert int(rp.replay_size(state)) == L - 1 - 3
  state = insert_rows(cfg, state, rows[-1:])
  # after terminal: all non-terminal rows 0..4 active
  assert int(rp.replay_size(state)) == L - 1


def test_uniform_sampling_frequencies():
  cfg = make_cfg(n_step=1, num_streams=1, slots_per_stream=64)
  state = rp.replay_init(cfg)
  state = insert_rows(cfg, state, simple_episode(cfg, 11))
  sample = jax.jit(functools.partial(rp.replay_sample, cfg, batch_size=512))
  counts = np.zeros(64)
  for i in range(40):
    _, leaves, w = sample(state, key=jax.random.PRNGKey(i))
    counts += np.bincount(np.asarray(leaves), minlength=64)
    np.testing.assert_allclose(np.asarray(w), 1.0)  # α=0,β=0 → weights 1
  freqs = counts / counts.sum()
  active = freqs[:10]
  np.testing.assert_allclose(active, 1 / 10, atol=0.01)
  assert freqs[10:].sum() == 0


def test_prioritized_sampling_frequencies_and_weights():
  cfg = make_cfg(n_step=1, num_streams=1, slots_per_stream=64,
                 priority_exponent=0.8, uniform_sample_probability=0.1)
  state = rp.replay_init(cfg)
  state = insert_rows(cfg, state, simple_episode(cfg, 6))  # rows 0..4 active
  # set distinct priorities
  leaves = jnp.arange(5)
  prios = jnp.array([1.0, 2.0, 3.0, 4.0, 10.0])
  state = rp.replay_update_priorities(cfg, state, leaves, prios)
  p_exp = np.asarray(prios) ** 0.8
  expect = 0.9 * p_exp / p_exp.sum() + 0.1 / 5
  sample = jax.jit(functools.partial(rp.replay_sample, cfg, batch_size=1024,
                                     importance_sampling_exponent=0.6))
  counts = np.zeros(64)
  weights_seen = {}
  for i in range(40):
    _, ls, w = sample(state, key=jax.random.PRNGKey(100 + i))
    counts += np.bincount(np.asarray(ls), minlength=64)
    for l, wi in zip(np.asarray(ls), np.asarray(w)):
      weights_seen[int(l)] = wi
  freqs = counts / counts.sum()
  np.testing.assert_allclose(freqs[:5], expect, atol=0.01)
  # IS weights ∝ (1/(N p))^β normalized to max 1
  raw = (1.0 / (5 * expect)) ** 0.6
  want = raw / raw.max()
  got = np.array([weights_seen[i] for i in range(5)])
  np.testing.assert_allclose(got, want, rtol=1e-3)
  assert int(rp.replay_size(state)) == 5


def test_max_seen_priority_tracked():
  cfg = make_cfg(priority_exponent=0.6)
  state = rp.replay_init(cfg)
  assert float(state.max_seen_priority) == 1.0
  state = insert_rows(cfg, state, simple_episode(cfg, 4))
  state = rp.replay_update_priorities(cfg, state, jnp.array([0]),
                                      jnp.array([7.5]))
  assert float(state.max_seen_priority) == 7.5


def test_ring_eviction_keeps_stacks_valid():
  """Once the ring wraps, rows whose stack frames were overwritten must not
  be sampleable."""
  cfg = make_cfg(n_step=1, num_streams=1, slots_per_stream=16)
  state = rp.replay_init(cfg)
  # one long episode of 40 steps through a 16-slot ring
  state = insert_rows(cfg, state, simple_episode(cfg, 40))
  _, leaves, _ = rp.replay_sample(cfg, state, jax.random.PRNGKey(3), 512)
  ks = np.asarray(state.row_t).reshape(-1)[np.asarray(leaves)]
  # alive rows are 24..39; stack-corrupt rows 24..26 and the unsampleable
  # newest row 39 and terminal row must be excluded
  assert ks.min() >= 24 + 3
  assert ks.max() <= 38
  # all sampled stacks contain correct frame content
  batch, _, _ = rp.replay_sample(cfg, state, jax.random.PRNGKey(4), 64)


def test_insert_jits_and_shapes_stable():
  cfg = make_cfg(n_step=3)
  state = rp.replay_init(cfg)
  s = cfg.num_streams
  ins = jax.jit(functools.partial(rp.replay_insert, cfg))
  for i in range(5):
    state = ins(state,
                frame=jnp.zeros((s, F, F), jnp.uint8),
                stack_count=jnp.full((s,), 4, jnp.int32),
                action=jnp.zeros((s,), jnp.int32),
                reward=jnp.zeros((s,)),
                discount=jnp.ones((s,)),
                is_terminal=jnp.zeros((s,), jnp.bool_))
  assert int(state.t) == 5


def test_state_is_a_serializable_pytree():
  cfg = make_cfg()
  state = rp.replay_init(cfg)
  leaves, treedef = jax.tree_util.tree_flatten(state)
  state2 = jax.tree_util.tree_unflatten(treedef, leaves)
  assert all((np.asarray(a) == np.asarray(b)).all()
             for a, b in zip(jax.tree_util.tree_leaves(state),
                             jax.tree_util.tree_leaves(state2)))


def test_fresh_replay_with_restored_insert_counter():
  """Replay-less resume scenario (run/train.py --checkpoint_replay=false):
  a freshly initialized buffer continues from a persisted cumulative insert
  counter. Inserts land mid-ring (slot t mod C), nothing spuriously
  activates (fresh row_t = -1 guards activation), and after enough inserts
  sampling works exactly like a fresh buffer's."""
  cfg = make_cfg(n_step=1, priority_exponent=0.6)
  t0 = 1_000_003  # arbitrary mid-ring continuation point
  state = rp.replay_init(cfg)._replace(
      t=jnp.asarray(t0, jnp.int32),
      max_seen_priority=jnp.asarray(7.5, jnp.float32))
  assert int(rp.replay_size(state)) == 0
  state = insert_rows(cfg, state, simple_episode(cfg, 6))
  # Same active-count law as a fresh buffer: 5 non-terminal rows per stream,
  # minus the newest (no successor yet) → the terminal insert activates it.
  assert int(rp.replay_size(state)) == 5 * cfg.num_streams
  assert int(state.t) == t0 + 6
  batch, leaves, weights = rp.replay_sample(
      cfg, state, jax.random.PRNGKey(0), 64, importance_sampling_exponent=0.4)
  assert np.isfinite(np.asarray(weights)).all()
  term = np.asarray(state.is_terminal).reshape(-1)[np.asarray(leaves)]
  assert not term.any()
  # max_seen_priority survives and continues to drive insert priorities.
  assert float(state.max_seen_priority) >= 7.5


def test_is_weight_chunk_normalization_restores_reference_scale():
  """Big-batch IS weights: normalizing by the GLOBAL batch max (an extreme
  order statistic over 32x more samples than the reference's batch) crushes
  the mean weight — a hidden effective-LR cut that flatlined the
  prioritized agent at the chains' regime. Chunk normalization (one max
  per reference-batch of samples) must (a) give each chunk max 1, (b)
  yield a strictly larger mean weight than the global max, (c) degenerate
  to the old behavior when chunking is off."""
  cfg = make_cfg(n_step=1, priority_exponent=0.6,
                 normalize_weights_chunk=16)
  cfg0 = make_cfg(n_step=1, priority_exponent=0.6)
  state = rp.replay_init(cfg)
  # Two episodes fill the buffer; then spread priorities wide.
  state = insert_rows(cfg, state, simple_episode(cfg, 8))
  state = insert_rows(cfg, state, simple_episode(cfg, 6, start_step=8))
  active = np.nonzero(np.asarray(
      state.indicator_tree[0][:cfg.num_streams * cfg.slots_per_stream]))[0]
  # All-distinct priorities so sampled probabilities (and hence weights)
  # actually spread — equal priorities normalize to all-ones trivially.
  prios = np.linspace(0.05, 4.0, len(active)) ** 2
  state = rp.replay_update_priorities(
      cfg, state, jnp.asarray(active, jnp.int32),
      jnp.asarray(prios, jnp.float32))
  _, _, w_chunk = rp.replay_sample(cfg, state, jax.random.PRNGKey(0), 128,
                                   importance_sampling_exponent=0.9)
  _, _, w_glob = rp.replay_sample(cfg0, state, jax.random.PRNGKey(0), 128,
                                  importance_sampling_exponent=0.9)
  w_chunk, w_glob = np.asarray(w_chunk), np.asarray(w_glob)
  per_chunk_max = w_chunk.reshape(-1, 16).max(axis=1)
  np.testing.assert_allclose(per_chunk_max, 1.0, rtol=1e-6)
  assert w_chunk.mean() > w_glob.mean()
  assert w_glob.max() == 1.0
  # Same leaves sampled either way (normalization is downstream of choice).
  assert w_chunk.shape == w_glob.shape
