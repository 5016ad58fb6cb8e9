"""HBM-resident replay for vectorized actor-learner training.

Replaces the reference's host-side NumPy replay stack
(/root/reference/dqn_zoo/replay.py: TransitionReplay:120-200,
PrioritizedTransitionReplay:654-768, PrioritizedDistribution:429-651,
TransitionAccumulator:771-805, NStepTransitionAccumulator:826-892, snappy
compression:895-904) with a single device-resident structure designed around
TPU constraints: static shapes, no host round trips, vectorized over S
parallel env streams.

Key ideas
=========

* **Row store, not transition store.** One row per (stream, agent-step):
  the newest 84×84 frame of that step's observation stack, the stack fill
  count, the action taken, and the aggregated reward/discount *received at*
  that step. Observation stacks are reconstructed at sample time by gathering
  up to 4 consecutive frames (zero-masked by fill count), replacing snappy
  compression with ~8× in-memory dedup (ref stores both 4-frame stacks per
  transition; we store 1 frame per step).

* **n-step at sample time.** The reference's NStepTransitionAccumulator
  (deque + episode-end suffix flush) becomes *activation timing*: a row
  inserted at global step k becomes sampleable when row k+n lands (the deque
  filling up), or immediately when its episode terminates (the suffix
  flush — shorter effective horizon). Reward/discount folding
  (replay.py:808-823: r = Σ_m Π_{l<m}γ_l · r_m, γ = Π γ_m) happens on
  gathered rows at sample time, truncated at the first terminal row.

* **Priorities via two radix-128 fanout trees** (replay/fanout_tree.py —
  lane-width segment sums, 2-3 levels instead of log2(P)). `value_tree` holds
  priority^α for *active* rows (0 = inactive, reproducing the reference's
  0^0 = 0 rule, replay.py:203-208); `indicator_tree` holds 1.0 for active
  rows, giving both the active count and uniform-among-active sampling for
  the reference's mixture rule (replay.py:547-583: with probability
  `uniform_sample_probability` sample uniformly, else proportionally).
  Uniform replay is exactly the special case α = 0, β = 0.

* **Ring eviction = leaf overwrite.** Inserting at slot t mod C zeroes the
  leaves of the overwritten row and of the 3 following slots (whose stacks
  would need frames older than the ring — the reference never has this
  problem because it stores full stacks; we mask instead of storing).

Invariants (C = slots per stream, n = n_step, K = stack size):
  * C > n + K.
  * A row's future rows (k+1..k+n) are newer, so they outlive it.
  * Active ⇔ indicator leaf == 1 ⇔ row yields a well-defined transition.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dqn_zoo_tpu.replay import fanout_tree as ft
from dqn_zoo_tpu.replay import window_gather as wg


@dataclasses.dataclass(frozen=True)
class ReplayConfig:
  num_streams: int  # S: parallel env streams feeding this replay shard
  slots_per_stream: int  # C: rows kept per stream
  n_step: int = 1
  stack_size: int = 4
  frame_size: int = 84
  priority_exponent: float = 0.0  # α; 0 → uniform replay
  uniform_sample_probability: float = 0.0  # mixture weight u
  normalize_weights: bool = True
  # IS-weight normalizer granularity. The reference normalizes by the max
  # over its batch of 32 (replay.py:211-243); a 32x bigger throughput-mode
  # batch makes that max an extreme order statistic and crushes the mean
  # weight ~2.3x (measured) — a hidden effective-LR cut that flatlined
  # prioritized while uniform agents learned. Normalizing per chunk of
  # `normalize_weights_chunk` samples reproduces the reference's
  # per-update weight statistics exactly (a big batch IS the average of
  # batch/chunk reference updates). 0 = single global max (old behavior;
  # also what a chunk equal to the batch size degenerates to).
  normalize_weights_chunk: int = 0
  use_pallas_gather: bool = False  # TPU: per-sample DMA window gathers
  pallas_interpret: bool = False  # CPU tests of the Pallas path

  def __post_init__(self):
    if self.slots_per_stream <= self.n_step + self.stack_size:
      raise ValueError("slots_per_stream must exceed n_step + stack_size")

  @property
  def window(self) -> int:
    """Consecutive rows covering both sampled stacks: K + n."""
    return self.stack_size + self.n_step

  @property
  def slots_padded(self) -> int:
    """Ring + wrap margin: rows [C, C+W-2] mirror slots [0, W-2] so a
    sample window never wraps; row C+W-1 is a write sink for inserts with
    no mirror."""
    return self.slots_per_stream + self.window

  @property
  def leaf_capacity(self) -> int:
    n = self.num_streams * self.slots_per_stream
    p = 1
    while p < n:
      p *= 2
    return p


class ReplayState(NamedTuple):
  frames: jax.Array  # (S, C+W, RH, RW) uint8 — padded rows (see
  # window_gather): newest frame of each row's stack; rows C..C+W-2 mirror
  # slots 0..W-2 so sample windows never wrap the ring
  stack_count: jax.Array  # (S, C) int32 in [1, K]
  action: jax.Array  # (S, C) int32
  reward: jax.Array  # (S, C) float32 — aggregated reward received at row
  discount: jax.Array  # (S, C) float32 — aggregated discount at row (×0.99)
  is_terminal: jax.Array  # (S, C) bool — row is episode-final
  row_t: jax.Array  # (S, C) int32 — global step index of row, -1 if empty
  value_tree: tuple  # fanout-tree levels — active priority^α at leaves
  indicator_tree: tuple  # fanout-tree levels — 1.0 for active rows
  t: jax.Array  # () int32 — rows inserted per stream so far
  max_seen_priority: jax.Array  # () float32


class TransitionBatch(NamedTuple):
  s_tm1: jax.Array  # (B, F, F, K) uint8
  a_tm1: jax.Array  # (B,) int32
  r_t: jax.Array  # (B,) float32
  discount_t: jax.Array  # (B,) float32
  s_t: jax.Array  # (B, F, F, K) uint8


def _pexp(priorities: jax.Array, exponent: float) -> jax.Array:
  """priority^exponent with the reference's 0^0 = 0 rule."""
  return jnp.where(priorities > 0.0,
                   jnp.power(jnp.maximum(priorities, 1e-30), exponent), 0.0)


def replay_init(cfg: ReplayConfig) -> ReplayState:
  s, c = cfg.num_streams, cfg.slots_per_stream
  rh, rw = wg.row_shape(cfg.frame_size)
  return ReplayState(
      frames=jnp.zeros((s, cfg.slots_padded, rh, rw), jnp.uint8),
      stack_count=jnp.ones((s, c), jnp.int32),
      action=jnp.zeros((s, c), jnp.int32),
      reward=jnp.zeros((s, c), jnp.float32),
      discount=jnp.zeros((s, c), jnp.float32),
      is_terminal=jnp.zeros((s, c), jnp.bool_),
      row_t=jnp.full((s, c), -1, jnp.int32),
      value_tree=ft.fanout_init(cfg.num_streams * cfg.slots_per_stream),
      indicator_tree=ft.fanout_init(cfg.num_streams * cfg.slots_per_stream),
      t=jnp.zeros((), jnp.int32),
      max_seen_priority=jnp.ones((), jnp.float32),
  )


def _leaf_ids(cfg: ReplayConfig, slot: jax.Array) -> jax.Array:
  """Leaf index per stream for a (possibly per-stream) slot array/scalar."""
  streams = jnp.arange(cfg.num_streams, dtype=jnp.int32)
  return streams * cfg.slots_per_stream + jnp.broadcast_to(
      slot, (cfg.num_streams,)).astype(jnp.int32)


def replay_insert(
    cfg: ReplayConfig,
    state: ReplayState,
    frame: jax.Array,  # (S, F, F) uint8 — newest frame of the new stack
    stack_count: jax.Array,  # (S,) int32
    action: jax.Array,  # (S,) int32
    reward: jax.Array,  # (S,) float32 (aggregated, clipped)
    discount: jax.Array,  # (S,) float32 (aggregated, ×0.99)
    is_terminal: jax.Array,  # (S,) bool
) -> ReplayState:
  """Inserts one row per stream (lockstep) and updates activations."""
  c = cfg.slots_per_stream
  n = cfg.n_step
  t = state.t
  slot = jnp.mod(t, c)

  # --- write row fields -----------------------------------------------------
  sidx = jnp.arange(cfg.num_streams)
  row = wg.pad_frames(frame)
  frames = state.frames.at[sidx, slot].set(row)
  # Mirror early slots into the wrap margin (slots 0..W-2 → rows C..C+W-2);
  # other inserts land in the write-sink row C+W-1.
  w = cfg.window
  mirror = jnp.where(slot < w - 1, c + slot, c + w - 1)
  frames = frames.at[sidx, mirror].set(row)
  new = state._replace(
      frames=frames,
      stack_count=state.stack_count.at[sidx, slot].set(stack_count),
      action=state.action.at[sidx, slot].set(action),
      reward=state.reward.at[sidx, slot].set(reward),
      discount=state.discount.at[sidx, slot].set(discount),
      is_terminal=state.is_terminal.at[sidx, slot].set(is_terminal),
      row_t=state.row_t.at[sidx, slot].set(t),
  )

  # --- collect all leaf writes, then rebuild both trees once ----------------
  kill_ids = []  # leaves to deactivate
  for off in range(cfg.stack_size):  # new row + 3 stack-corrupted successors
    kill_ids.append(_leaf_ids(cfg, jnp.mod(t + off, c)))
  kill_ids = jnp.concatenate(kill_ids)

  def activation(step, extra_mask):
    """Leaf ids + activation mask for the row inserted at global `step`."""
    a_slot = jnp.mod(step, c)
    ids = _leaf_ids(cfg, a_slot)
    exists = step >= 0
    right_row = new.row_t[sidx, a_slot] == step  # not yet overwritten
    not_terminal = ~new.is_terminal[sidx, a_slot]
    inactive = ft.fanout_get(new.indicator_tree, ids) == 0.0
    mask = exists & right_row & not_terminal & inactive & extra_mask
    return ids, mask

  act_ids, act_masks = [], []
  # Regular activation: row t-n's n-step future is now complete.
  ids, mask = activation(t - n, jnp.ones((cfg.num_streams,), jnp.bool_))
  act_ids.append(ids)
  act_masks.append(mask)
  # Suffix flush: on terminal insert, rows t-1 .. t-(n-1) activate early.
  for off in range(1, n):
    ids, mask = activation(t - off, is_terminal)
    act_ids.append(ids)
    act_masks.append(mask)
  act_ids = jnp.concatenate(act_ids)
  act_masks = jnp.concatenate(act_masks)

  all_ids = jnp.concatenate([kill_ids, act_ids])
  nkill = kill_ids.shape[0]
  # Guarded activations of already-active leaves must not zero them: writes
  # are masked to the leaf's current value when mask is False.
  cur_ind = ft.fanout_get(new.indicator_tree, act_ids)
  indicator_writes = jnp.concatenate([
      jnp.zeros_like(kill_ids, dtype=jnp.float32),
      jnp.where(act_masks, 1.0, cur_ind),
  ])
  indicator_tree = ft.fanout_set(new.indicator_tree, all_ids,
                                 indicator_writes)

  if cfg.priority_exponent == 0.0:
    # Uniform fast path: priority^0 of an active row is exactly 1, so the
    # value tree is the indicator tree — one rebuild per insert, not two
    # (the reference's uniform replay likewise never touches a sum tree,
    # replay.py:120-200).
    value_tree = indicator_tree
  else:
    prio = _pexp(state.max_seen_priority, cfg.priority_exponent)
    cur_val = ft.fanout_get(new.value_tree, act_ids)
    value_writes = jnp.concatenate([
        jnp.zeros_like(kill_ids, dtype=jnp.float32),
        jnp.where(act_masks, prio, cur_val),
    ])
    value_tree = ft.fanout_set(new.value_tree, all_ids, value_writes)

  return new._replace(value_tree=value_tree, indicator_tree=indicator_tree,
                      t=t + 1)


def _stack_from_window(cfg: ReplayConfig, window_frames: jax.Array,
                       count: jax.Array, offset: jax.Array) -> jax.Array:
  """Builds a (B, F, F, K) stack from gathered windows.

  window_frames: (B, W, F, F) rows w0..w0+W-1 where w0 = k - (K-1).
  The stack of the row at window position `offset` (K-1 for s_tm1,
  K-1+m* for s_t) is channels j = offset - (count-1) + j, zero-padded for
  j >= count — exact Deque(4)+trailing_zero_pad semantics
  (processors.py:497-505)."""
  k = cfg.stack_size
  j = jnp.arange(k, dtype=jnp.int32)
  idx = offset[:, None] - (count[:, None] - 1) + j[None, :]  # (B, K)
  valid = j[None, :] < count[:, None]
  idx = jnp.clip(idx, 0, cfg.window - 1)
  stack = jnp.take_along_axis(window_frames, idx[:, :, None, None], axis=1)
  stack = jnp.where(valid[:, :, None, None], stack, 0).astype(jnp.uint8)
  return jnp.moveaxis(stack, 1, -1)  # (B, F, F, K)


def replay_sample(
    cfg: ReplayConfig,
    state: ReplayState,
    key: jax.Array,
    batch_size: int,
    importance_sampling_exponent: jax.Array | float = 0.0,
) -> Tuple[TransitionBatch, jax.Array, jax.Array]:
  """Samples transitions; returns (batch, leaf_indices, is_weights).

  Mixture sampling per the reference (replay.py:547-583): with probability
  `uniform_sample_probability` uniform over active rows, else proportional
  to priority^α. IS weights follow replay.py:211-243 with the mixture
  probabilities, normalized by the batch max when configured.
  """
  c, n = cfg.slots_per_stream, cfg.n_step
  u_key, p_key, mix_key = jax.random.split(key, 3)

  total_p = ft.fanout_total(state.value_tree)
  n_active = ft.fanout_total(state.indicator_tree)

  if cfg.priority_exponent == 0.0:
    # Uniform fast path: proportional-to-1 sampling IS uniform-over-active,
    # so the mixture collapses to one indicator-tree query.
    leaves = ft.fanout_query(
        state.indicator_tree,
        jax.random.uniform(u_key, (batch_size,)) * n_active)
  else:
    prop_targets = jax.random.uniform(p_key, (batch_size,)) * total_p
    unif_targets = jax.random.uniform(u_key, (batch_size,)) * n_active
    prop_leaves = ft.fanout_query(state.value_tree, prop_targets)
    unif_leaves = ft.fanout_query(state.indicator_tree, unif_targets)
    use_uniform = (jax.random.uniform(mix_key, (batch_size,))
                   < cfg.uniform_sample_probability)
    leaves = jnp.where(use_uniform, unif_leaves, prop_leaves)

  stream = leaves // c
  slot = jnp.mod(leaves, c)
  k_step = state.row_t[stream, slot]  # (B,) global index of sampled row

  # --- horizon scan: find m* and fold rewards/discounts ---------------------
  m_star = jnp.full((batch_size,), n, jnp.int32)
  r_fold = jnp.zeros((batch_size,), jnp.float32)
  cum_disc = jnp.ones((batch_size,), jnp.float32)
  ended = jnp.zeros((batch_size,), jnp.bool_)
  for m in range(1, n + 1):
    fslot = jnp.mod(k_step + m, c)
    r_m = state.reward[stream, fslot]
    g_m = state.discount[stream, fslot]
    term_m = state.is_terminal[stream, fslot]
    live = ~ended
    r_fold = r_fold + jnp.where(live, cum_disc * r_m, 0.0)
    cum_disc = jnp.where(live, cum_disc * g_m, cum_disc)
    m_star = jnp.where(live & term_m, m, m_star)
    ended = ended | term_m

  # --- one contiguous window gather covers both stacks -----------------------
  k = cfg.stack_size
  w0_slot = jnp.mod(k_step - (k - 1), c)  # never wraps: margin rows mirror
  windows = wg.gather_windows(state.frames, stream, w0_slot, cfg.window,
                              use_pallas=cfg.use_pallas_gather,
                              interpret=cfg.pallas_interpret)
  windows = wg.unpad_frames(windows, cfg.frame_size)  # (B, W, F, F)
  count_tm1 = state.stack_count[stream, slot]
  count_t = state.stack_count[stream, jnp.mod(k_step + m_star, c)]
  off_tm1 = jnp.full((batch_size,), k - 1, jnp.int32)
  s_tm1 = _stack_from_window(cfg, windows, count_tm1, off_tm1)
  s_t = _stack_from_window(cfg, windows, count_t, off_tm1 + m_star)
  batch = TransitionBatch(
      s_tm1=s_tm1,
      a_tm1=state.action[stream, slot],
      r_t=r_fold,
      discount_t=cum_disc,
      s_t=s_t,
  )

  # --- importance sampling weights ------------------------------------------
  p_leaf = ft.fanout_get(state.value_tree, leaves)
  u = cfg.uniform_sample_probability
  probs = (1.0 - u) * p_leaf / jnp.maximum(total_p, 1e-30) \
      + u / jnp.maximum(n_active, 1.0)
  weights = jnp.power(
      1.0 / (jnp.maximum(probs, 1e-30) * jnp.maximum(n_active, 1.0)),
      importance_sampling_exponent)
  if cfg.normalize_weights:
    c = cfg.normalize_weights_chunk
    if c > 0 and batch_size > c and batch_size % c == 0:
      # Per-reference-batch chunk normalization (see ReplayConfig).
      w = weights.reshape(batch_size // c, c)
      w = w / jnp.maximum(jnp.max(w, axis=1, keepdims=True), 1e-30)
      weights = w.reshape(batch_size)
    else:
      weights = weights / jnp.maximum(jnp.max(weights), 1e-30)
  return batch, leaves, weights


def replay_update_priorities(cfg: ReplayConfig, state: ReplayState,
                             leaves: jax.Array,
                             priorities: jax.Array) -> ReplayState:
  """Sets raw priorities of sampled rows (ref replay.py:727-740)."""
  still_active = ft.fanout_get(state.indicator_tree, leaves) > 0.0
  cur = ft.fanout_get(state.value_tree, leaves)
  vals = jnp.where(still_active, _pexp(priorities, cfg.priority_exponent),
                   cur)
  value_tree = ft.fanout_set(state.value_tree, leaves, vals)
  max_seen = jnp.maximum(state.max_seen_priority, jnp.max(priorities))
  return state._replace(value_tree=value_tree, max_seen_priority=max_seen)


def importance_sampling_weights(probs: jax.Array, num: jax.Array,
                                exponent: jax.Array,
                                normalize: bool = True) -> jax.Array:
  """Standalone IS weights (ref replay.py:211-243)."""
  w = jnp.power(1.0 / (jnp.maximum(probs, 1e-30) * num), exponent)
  if normalize:
    w = w / jnp.maximum(jnp.max(w), 1e-30)
  return w


def replay_size(state: ReplayState) -> jax.Array:
  """Number of sampleable transitions (active rows)."""
  return ft.fanout_total(state.indicator_tree).astype(jnp.int32)
