"""The actor-learner superstep: one jitted function that is the whole trainer.

This inverts the reference's control flow (SURVEY.md §3.2): where dqn_zoo
drives ONE env from Python and calls two small jitted functions per 64
frames, here a single compiled function advances B env streams one
agent-step (4 raw frames), inserts B replay rows, and runs gated SGD — and
the host calls a `lax.scan` over K supersteps per dispatch, so per-call
overhead (~3 ms on the axon tunnel) amortizes to nothing.

Step order guarantees the reference's data alignment (dqn/agent.py:133-158):

  1. act on the CURRENT stacks  → actions a_k for observations o_k
  2. insert the PENDING row k   → (o_k's newest frame, a_k, r_k, γ_k, ...)
     (pending because a_k only exists now; rewards/discounts were produced
     by the env step that yielded o_k, cached from the previous superstep)
  3. env.step(a_k)              → group output for o_{k+1}
  4. preprocess + stack update  → o_{k+1}
  5. cache pending row k+1
  6. gated learning: sample → loss → grad (psum over mesh axis if present)
     → optax → priorities; target-net swap on frame-count boundaries

Replay-ratio equivalence: the reference samples batch 32 every 16 frames of
one stream = 8 samples per inserted transition. The driver chooses
(learn_every, updates_per_learn, batch_size) to preserve that ratio for any
B (DESIGN.md); at B=1/batch 32/learn_every 4 this engine reduces exactly to
the reference schedule.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dqn_zoo_tpu import prep
from dqn_zoo_tpu.agents.base import AgentSpec, make_optimizer
from dqn_zoo_tpu.envs.api import get_game
from dqn_zoo_tpu.envs.vector import (VecEnvState, VectorAtariEnv,
                                     VectorEnvConfig)
from dqn_zoo_tpu.replay import device_replay as dr
from dqn_zoo_tpu.utils.schedules import linear_schedule


@dataclasses.dataclass(frozen=True)
class EngineConfig:
  agent: AgentSpec
  game: str
  num_envs: int
  slots_per_stream: int
  batch_size: int = 32
  learn_every: int = 1  # supersteps between learn blocks
  updates_per_learn: int = 1  # SGD steps per learn block
  total_train_frames: int = 200_000_000  # schedule horizon (all streams)
  env_config: VectorEnvConfig = VectorEnvConfig()
  # "fast" (antialiased float bilinear) or "pil" (bit-exact Pillow resample,
  # prep/pil_resize.py) for the 84×84 observation resize.
  resize_method: str = "fast"
  # Mesh axis name for gradient psum; None on a single device.
  pmap_axis: Optional[str] = None
  # Overlap mode (RESULTS.md roadmap 3): learn samples the PRE-insert
  # replay, which breaks the data dependence between the env/prep/render
  # subgraph and the learn matmuls so XLA's scheduler can interleave them
  # (a single TensorCore runs one instruction stream — "overlap" here means
  # filling the learn block's non-MXU gaps with env vector work, which the
  # insert→learn ordering otherwise forbids). Semantics shift: a sampled
  # batch can't contain the row inserted THIS superstep — a 1-row-per-
  # stream staleness in a ~1M-row buffer (the reference adds then learns,
  # dqn/agent.py:146-153, so parity mode keeps this False).
  overlap_env_learn: bool = False
  # Action-set size override for games with NO JAX-native implementation
  # (ALE-only cartridges driven through engine/host_env.py): the fused
  # engine then skips building the on-device env and sizes the network
  # from this. 0 = resolve from the JAX-native registry.
  num_actions: int = 0
  # Number of identical shards running this engine (multi-chip data
  # parallelism): schedule clocks (ε, β, target swaps, min-fill) are driven
  # by LOCAL counters scaled by this factor, so no collective is needed to
  # keep global frame-unit semantics.
  frame_multiplier: int = 1

  @property
  def replay_capacity(self) -> int:
    return self.num_envs * self.slots_per_stream

  def replay_config(self) -> dr.ReplayConfig:
    a = self.agent
    # Per-sample DMA window gathers beat XLA's gather on TPU (issue-rate
    # bound either way, but the DMA path is ~1.4× faster and frees the
    # split-phase overlap option); CPU (tests, dry runs) uses the portable
    # XLA path — same math, differential-tested.
    return dr.ReplayConfig(
        num_streams=self.num_envs,
        slots_per_stream=self.slots_per_stream,
        n_step=a.n_step,
        priority_exponent=a.priority_exponent,
        uniform_sample_probability=a.uniform_sample_probability,
        normalize_weights=a.normalize_weights,
        # IS weights normalize per reference-batch chunk so throughput
        # mode's big batches keep the reference's per-update weight scale
        # (device_replay.ReplayConfig.normalize_weights_chunk).
        normalize_weights_chunk=a.batch_size,
        use_pallas_gather=jax.default_backend() == "tpu",
    )


class PendingRow(NamedTuple):
  """Row k awaiting its action (chosen at the start of the next superstep).

  The initial pending row (before any env step) is marked terminal: terminal
  rows never activate, so inserting it unconditionally is harmless — this
  avoids a lax.cond over the multi-hundred-MB replay state, which would
  force a copy of the frame store every superstep."""

  frame: jax.Array  # (B, 84, 84) uint8
  stack_count: jax.Array  # (B,)
  reward: jax.Array  # (B,) clipped aggregated reward received at o_k
  discount: jax.Array  # (B,) aggregated discount ×0.99
  is_terminal: jax.Array  # (B,)


class Telemetry(NamedTuple):
  episode_return: jax.Array  # (B,) raw return of in-progress episodes
  episode_frames: jax.Array  # (B,) raw frames of in-progress episodes
  completed_return_sum: jax.Array  # ()
  completed_count: jax.Array  # ()
  last_episode_return: jax.Array  # ()
  state_value_ewma: jax.Array  # () — ref parts.py:287-329 tracker
  ewma_trace: jax.Array  # () bias-correction trace
  last_loss: jax.Array  # ()
  learn_steps: jax.Array  # ()


class EngineState(NamedTuple):
  env: VecEnvState
  stack: prep.FrameStackState
  pending: PendingRow
  replay: dr.ReplayState
  online_params: Any
  target_params: Any
  opt_state: Any
  rng: jax.Array
  env_frames: jax.Array  # () int32 — total raw frames across streams
  superstep: jax.Array  # () int32
  telemetry: Telemetry


class Metrics(NamedTuple):
  env_frames: jax.Array
  episodes: jax.Array
  mean_episode_return: jax.Array
  state_value_ewma: jax.Array
  last_loss: jax.Array
  exploration_epsilon: jax.Array
  replay_size: jax.Array
  learn_steps: jax.Array


class EvalState(NamedTuple):
  env: VecEnvState
  stack: prep.FrameStackState
  rng: jax.Array
  env_frames: jax.Array
  episode_return: jax.Array  # (B,)
  completed_return_sum: jax.Array
  completed_count: jax.Array


class Engine:
  """Builds the jitted train/eval supersteps for one agent+game config."""

  def __init__(self, config: EngineConfig):
    self.config = config
    self.spec = config.agent
    try:
      self.game = get_game(config.game)
    except KeyError:
      # ALE-only cartridge: legal when the caller supplies the action-set
      # size (engine/host_env.py does) — the host env replaces the
      # on-device one, everything else (nets, replay, schedules) is shared.
      if config.num_actions <= 0:
        raise
      self.game = None
    if self.game is not None:
      self.env = VectorAtariEnv(self.game, config.num_envs,
                                config.env_config)
      num_actions = self.game.num_actions
    else:
      self.env = None
      num_actions = config.num_actions
    self.network = self.spec.make_network(self.spec, num_actions)
    self.optimizer = make_optimizer(self.spec)
    self.rcfg = config.replay_config()

  # --- schedules (frame units; formulas from dqn/run_atari.py:160-173 and
  # prioritized/run_atari.py IS schedule) --------------------------------

  def exploration_epsilon(self, env_frames):
    s = self.spec
    if s.greedy_actor:
      return jnp.zeros(())
    m = self.config.frame_multiplier
    begin_t = s.min_replay_capacity_fraction * self.config.replay_capacity \
        * m * self.config.env_config.action_repeat
    decay = s.exploration_epsilon_decay_frame_fraction \
        * self.config.total_train_frames
    env_frames = jnp.asarray(env_frames, jnp.float32) * m
    return linear_schedule(env_frames,
                           begin_value=s.exploration_epsilon_begin,
                           end_value=s.exploration_epsilon_end,
                           begin_t=begin_t, end_t=begin_t + decay)

  def importance_sampling_exponent(self, inserted_transitions):
    s = self.spec
    m = self.config.frame_multiplier
    begin_t = s.min_replay_capacity_fraction * self.config.replay_capacity * m
    end_t = self.config.total_train_frames \
        // self.config.env_config.action_repeat
    inserted_transitions = jnp.asarray(inserted_transitions, jnp.float32) * m
    return linear_schedule(inserted_transitions,
                           begin_value=s.importance_sampling_begin,
                           end_value=s.importance_sampling_end,
                           begin_t=begin_t, end_t=end_t)

  # --- init -----------------------------------------------------------------

  def init(self, key: jax.Array) -> EngineState:
    b = self.config.num_envs
    key, env_key, net_key = jax.random.split(key, 3)
    sample_obs = jnp.zeros((1, 84, 84, 4), jnp.uint8)
    if self.spec.init_network is not None:
      online = self.spec.init_network(self.spec, self.network, net_key,
                                      sample_obs)
    else:
      online = self.network.init(net_key, sample_obs)
    # No leaf may alias another (same buffer in two slots): the CLI donates
    # the whole state into each train chunk, and XLA rejects donating one
    # buffer twice. Hence the explicit target copy and per-field zeros.
    return EngineState(
        # None (empty subtree) for ALE-only cartridges: the host engine
        # discards this leaf and steps its own env (engine/host_env.py).
        env=self.env.init(env_key) if self.env is not None else None,
        stack=prep.frame_stack_init(b),
        pending=PendingRow(
            frame=jnp.zeros((b, 84, 84), jnp.uint8),
            stack_count=jnp.ones((b,), jnp.int32),
            reward=jnp.zeros((b,), jnp.float32),
            discount=jnp.zeros((b,), jnp.float32),
            is_terminal=jnp.ones((b,), jnp.bool_),  # neutral first row
        ),
        replay=dr.replay_init(self.rcfg),
        online_params=online,
        target_params=jax.tree.map(jnp.copy, online),
        opt_state=self.optimizer.init(online),
        rng=key,
        env_frames=jnp.zeros((), jnp.int32),
        superstep=jnp.zeros((), jnp.int32),
        telemetry=Telemetry(
            episode_return=jnp.zeros((b,), jnp.float32),
            episode_frames=jnp.zeros((b,), jnp.int32),
            completed_return_sum=jnp.zeros(()),
            completed_count=jnp.zeros(()),
            last_episode_return=jnp.full((), jnp.nan),
            state_value_ewma=jnp.zeros(()),
            ewma_trace=jnp.zeros(()),
            last_loss=jnp.full((), jnp.nan),
            learn_steps=jnp.zeros((), jnp.int32),
        ),
    )

  # --- learning block -------------------------------------------------------

  def _sgd_update(self, replay_rows, target, carry, key):
    """One SGD step. Only (params, opt_state, value_tree) are carried —
    the bulky row data is read-only here, so it is closed over instead of
    threaded through cond/scan (no copies of the frame store)."""
    online, opt_state, value_tree = carry
    replay = replay_rows._replace(value_tree=value_tree)
    sample_key, loss_key = jax.random.split(key)
    beta = self.importance_sampling_exponent(
        replay.t.astype(jnp.float32) * self.config.num_envs)
    batch, leaves, weights = dr.replay_sample(
        self.rcfg, replay, sample_key, self.config.batch_size, beta)
    if self.spec.priority_exponent == 0.0:
      weights = jnp.ones_like(weights)

    def loss_fn(p):
      out = self.spec.loss(self.spec, self.network, p, target, batch,
                           weights, loss_key)
      return out.loss, out.priorities

    (loss, priorities), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        online)
    if self.config.pmap_axis is not None:
      grads = jax.lax.pmean(grads, axis_name=self.config.pmap_axis)
    updates, opt_state = self.optimizer.update(grads, opt_state)
    online = optax.apply_updates(online, updates)
    if self.spec.priority_exponent > 0.0:
      replay = dr.replay_update_priorities(self.rcfg, replay, leaves,
                                           priorities)
      value_tree = replay.value_tree
    return (online, opt_state, value_tree), loss

  # --- the superstep --------------------------------------------------------

  def superstep(self, state: EngineState) -> EngineState:
    cfg = self.config
    rng, act_key, learn_key = jax.random.split(state.rng, 3)

    # 1. act on current stacks.
    eps = self.exploration_epsilon(state.env_frames.astype(jnp.float32))
    obs = state.stack.frames
    actions, values = self.spec.act(self.spec, self.network,
                                    state.online_params, act_key, obs, eps)

    # 2. insert the pending row, now that its action exists (unconditional:
    # the pre-first-step pending row is terminal ⇒ inert). In overlap mode
    # the insert moves AFTER the learn block (see EngineConfig
    # .overlap_env_learn): learn reads the pre-insert replay, so the env/
    # prep subgraph below carries no data dependence on the learn matmuls
    # and XLA may interleave them.
    def do_insert(rep):
      return dr.replay_insert(
          self.rcfg, rep,
          frame=state.pending.frame,
          stack_count=state.pending.stack_count,
          action=actions,
          reward=state.pending.reward,
          discount=state.pending.discount,
          is_terminal=state.pending.is_terminal,
      )

    replay = state.replay if cfg.overlap_env_learn else do_insert(
        state.replay)

    # 3-4. env step + preprocessing.
    env_state, out = self.env.step(state.env, actions)
    obs84 = prep.pooled_frame_to_84(out.frame_penult, out.frame_last,
                                    self.config.resize_method)
    stack = prep.frame_stack_update(state.stack, obs84, out.is_first)

    # 5. cache the next pending row (FIRST rows carry zero reward/discount —
    # they are never folded over; see device_replay docstring).
    pending = PendingRow(
        frame=obs84,
        stack_count=stack.count,
        reward=jnp.where(out.is_first, 0.0,
                         jnp.clip(out.reward_sum, -1.0, 1.0)),
        discount=jnp.where(out.is_first, 0.0, out.discount_prod * 0.99),
        is_terminal=out.is_last,
    )

    env_frames = state.env_frames + jnp.sum(out.frames_used)

    # 6. gated learning.
    min_fill = self.spec.min_replay_capacity_fraction * cfg.replay_capacity
    can_learn = (dr.replay_size(replay) >= min_fill) & \
        (jnp.mod(state.superstep, cfg.learn_every) == 0)

    # Only the small mutable pieces go through the cond — the frame store and
    # row fields are closed over read-only, so the cond moves ~MBs, not the
    # full replay buffer.
    import functools as _ft
    sgd = _ft.partial(self._sgd_update, replay, state.target_params)

    def learn(operand):
      carry = operand
      if cfg.updates_per_learn == 1:
        carry, loss = sgd(carry, learn_key)
      else:
        keys = jax.random.split(learn_key, cfg.updates_per_learn)
        carry, losses = jax.lax.scan(sgd, carry, keys)
        loss = losses[-1]
      online, opt_state, value_tree = carry
      return online, opt_state, value_tree, loss, \
          jnp.asarray(cfg.updates_per_learn, jnp.int32)

    def no_learn(operand):
      online, opt_state, value_tree = operand
      return online, opt_state, value_tree, state.telemetry.last_loss, \
          jnp.zeros((), jnp.int32)

    online, opt_state, value_tree, last_loss, nupd = jax.lax.cond(
        can_learn, learn, no_learn,
        (state.online_params, state.opt_state, replay.value_tree))
    replay = replay._replace(value_tree=value_tree)
    if cfg.overlap_env_learn:
      # Deferred insert: lands on the priority-updated trees, keeping the
      # tree writes of learn and insert strictly ordered.
      replay = do_insert(replay)

    # 7. target swap on frame-count boundary crossings (ref
    # dqn/agent.py:155-156: frame_t % period == 0, generalized to streams;
    # under sharding the period is counted in global frames).
    period = max(
        1, self.spec.target_network_update_period
        // self.config.frame_multiplier)
    crossed = (state.env_frames // period) != (env_frames // period)
    target = jax.tree.map(
        lambda o, t: jnp.where(crossed, o, t), online, state.target_params)

    # 8. telemetry.
    tel = state.telemetry
    ep_ret = tel.episode_return + out.raw_reward_sum
    finished = out.is_last
    completed_sum = tel.completed_return_sum + jnp.sum(
        jnp.where(finished, ep_ret, 0.0))
    completed_cnt = tel.completed_count + jnp.sum(finished)
    # last completed return (any finished env; max index wins, arbitrary)
    any_fin = finished.any()
    last_ret = jnp.where(
        any_fin,
        jnp.sum(jnp.where(finished, ep_ret, 0.0)) /
        jnp.maximum(jnp.sum(finished), 1),
        tel.last_episode_return)
    ep_ret = jnp.where(finished, 0.0, ep_ret)
    # Unbiased EWMA of mean state value (ref parts.py:287-329, step 1e-3).
    step_size = 1e-3
    trace = (1.0 - step_size) * tel.ewma_trace + step_size
    ewma = (1.0 - step_size) * tel.state_value_ewma + step_size * \
        jnp.mean(values)
    telemetry = Telemetry(
        episode_return=ep_ret,
        episode_frames=jnp.where(finished, 0,
                                 tel.episode_frames + out.frames_used),
        completed_return_sum=completed_sum,
        completed_count=completed_cnt,
        last_episode_return=last_ret,
        state_value_ewma=ewma,
        ewma_trace=trace,
        last_loss=last_loss,
        learn_steps=tel.learn_steps + nupd,
    )

    return EngineState(
        env=env_state, stack=stack, pending=pending, replay=replay,
        online_params=online, target_params=target, opt_state=opt_state,
        rng=rng, env_frames=env_frames, superstep=state.superstep + 1,
        telemetry=telemetry)

  def run(self, state: EngineState, num_supersteps: int) -> EngineState:
    """num_supersteps supersteps under one lax.scan (jit this)."""

    def body(s, _):
      return self.superstep(s), None

    state, _ = jax.lax.scan(body, state, None, length=num_supersteps)
    return state

  def metrics(self, state: EngineState) -> Metrics:
    tel = state.telemetry
    mean_ret = tel.completed_return_sum / jnp.maximum(tel.completed_count, 1)
    # No completed episode this phase → report the mean IN-PROGRESS return,
    # the reference's EpisodeTracker convention (parts.py:186-196: "mean over
    # complete episodes else current"). Never a stale previous-phase value.
    mean_ret = jnp.where(tel.completed_count > 0, mean_ret,
                         jnp.mean(tel.episode_return))
    ewma = jnp.where(tel.ewma_trace > 0,
                     tel.state_value_ewma / jnp.maximum(tel.ewma_trace, 1e-12),
                     jnp.nan)
    return Metrics(
        env_frames=state.env_frames,
        episodes=tel.completed_count,
        mean_episode_return=mean_ret,
        state_value_ewma=ewma,
        last_loss=tel.last_loss,
        exploration_epsilon=self.exploration_epsilon(
            state.env_frames.astype(jnp.float32)),
        replay_size=dr.replay_size(state.replay),
        learn_steps=tel.learn_steps,
    )

  def reset_telemetry(self, state: EngineState) -> EngineState:
    """Per-phase tracker reset (ref parts.py:150-247 reset convention).

    Clears completed-episode sums AND the last-completed/last-loss scalars so
    a phase with zero completed episodes (or zero learn steps) can never
    report the previous phase's values. In-progress per-stream returns are
    kept — episodes legitimately span iterations here (the reference instead
    rebuilds the env each iteration) — and metrics() falls back to their
    mean, matching the reference's "else current" rule.
    """
    tel = state.telemetry
    return state._replace(telemetry=tel._replace(
        completed_return_sum=jnp.zeros(()),
        completed_count=jnp.zeros(()),
        last_episode_return=jnp.full((), jnp.nan),
        last_loss=jnp.full((), jnp.nan),
    ))

  # --- evaluation -----------------------------------------------------------

  def eval_init(self, key: jax.Array, num_envs: Optional[int] = None
                ) -> EvalState:
    b = num_envs or self.config.num_envs
    env = VectorAtariEnv(self.game, b, self.config.env_config)
    key, env_key = jax.random.split(key)
    return EvalState(
        env=env.init(env_key),
        stack=prep.frame_stack_init(b),
        rng=key,
        env_frames=jnp.zeros((), jnp.int32),
        episode_return=jnp.zeros((b,)),
        completed_return_sum=jnp.zeros(()),
        completed_count=jnp.zeros(()),
    )

  def eval_superstep(self, params, state: EvalState) -> EvalState:
    b = state.episode_return.shape[0]
    env = VectorAtariEnv(self.game, b, self.config.env_config)
    rng, act_key = jax.random.split(state.rng)
    eps = jnp.asarray(self.spec.eval_exploration_epsilon)
    actions, _ = self.spec.act(self.spec, self.network, params, act_key,
                               state.stack.frames, eps)
    env_state, out = env.step(state.env, actions)
    obs84 = prep.pooled_frame_to_84(out.frame_penult, out.frame_last,
                                    self.config.resize_method)
    stack = prep.frame_stack_update(state.stack, obs84, out.is_first)
    ep_ret = state.episode_return + out.raw_reward_sum
    finished = out.is_last
    return EvalState(
        env=env_state, stack=stack, rng=rng,
        env_frames=state.env_frames + jnp.sum(out.frames_used),
        episode_return=jnp.where(finished, 0.0, ep_ret),
        completed_return_sum=state.completed_return_sum + jnp.sum(
            jnp.where(finished, ep_ret, 0.0)),
        completed_count=state.completed_count + jnp.sum(finished),
    )

  def eval_run(self, params, state: EvalState, num_supersteps: int
               ) -> EvalState:
    def body(s, _):
      return self.eval_superstep(params, s), None

    state, _ = jax.lax.scan(body, state, None, length=num_supersteps)
    return state
