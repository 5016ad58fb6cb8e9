"""Decompose the learn step: sample vs loss/grad vs optimizer, on real TPU.

The per-agent profile showed learn ≈ 91% of the dqn superstep and bf16 ≈ 1.0×
(not MXU-bound). This isolates, at the bench config (B=256 → batch 2048):

  sample   — replay_sample only (8 frame-store gathers + tree queries)
  gather   — the two _gather_stack calls only
  lossgrad — value_and_grad(loss) on a fixed synthetic batch
  update   — optimizer update + apply_updates on fixed grads
  forward  — network.apply forward only (batch 2048)

Timing per CLAUDE.md rules: fetch-forced, chained inputs, median of chunks.

Usage: PYTHONPATH=/root/.axon_site:/root/repo nohup python \
    tools/profile_learn.py > /tmp/prof_learn.log 2>&1 &
"""

import functools
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import force


def timeit(name, fn, state, chunks=10, reps=10):
  """fn: state -> state (reps folded inside via scan where possible)."""
  for _ in range(3):
    state = fn(state)
  force(state)
  times = []
  for _ in range(chunks):
    t0 = time.time()
    state = fn(state)
    force(state)
    times.append(time.time() - t0)
  ms = statistics.median(times) / reps * 1e3
  print(json.dumps({"section": name, "ms": round(ms, 3)}), flush=True)
  return ms


def main():
  from dqn_zoo_tpu.run.train import build_engine
  from dqn_zoo_tpu.replay import device_replay as dr

  b = 256
  reps = 10
  eng = build_engine("dqn", "pong", b, replay_capacity=b * 256,
                     num_iterations=200, num_train_frames=10**6)
  cfg = eng.config
  batch_size = cfg.batch_size
  print(json.dumps({"batch_size": batch_size,
                    "updates_per_learn": cfg.updates_per_learn,
                    "learn_every": cfg.learn_every}), flush=True)

  state = eng.init(jax.random.PRNGKey(0))
  warm = jax.jit(functools.partial(eng.run, num_supersteps=64))
  state = warm(state)  # fill replay past min-fill
  force(state)

  replay = state.replay
  rcfg = eng.rcfg
  online = state.online_params
  target = state.target_params
  opt_state = state.opt_state
  net = eng.network
  spec = eng.spec

  # --- sample only (replay passed as an arg — closing over it would bake
  # 460MB of constants into the remote-compile request: HTTP 413) ----------
  @jax.jit
  def sample_n(key, replay):
    def body(k, _):
      k, sk = jax.random.split(k)
      batch, leaves, w = dr.replay_sample(rcfg, replay, sk, batch_size, 0.6)
      # fold batch into the carry cheaply so nothing is elided
      s = (batch.s_tm1[::257, 0, 0, 0].astype(jnp.uint32).sum()
           + batch.s_t[::257, 0, 0, 0].astype(jnp.uint32).sum()
           + leaves[0].astype(jnp.uint32))
      return jax.random.fold_in(k, s), ()
    key, _ = jax.lax.scan(body, key, None, length=reps)
    return key
  timeit("sample", lambda k: sample_n(k, replay), jax.random.PRNGKey(1),
         reps=reps)

  # --- gathers only ----------------------------------------------------------
  @jax.jit
  def gather_n(key, replay):
    def body(k, _):
      k, sk = jax.random.split(k)
      leaves = jax.random.randint(sk, (batch_size,), 0,
                                  rcfg.num_streams * rcfg.slots_per_stream)
      stream = leaves // rcfg.slots_per_stream
      kstep = replay.row_t[stream, jnp.mod(leaves, rcfg.slots_per_stream)]
      s_tm1 = dr._gather_stack(rcfg, replay, stream, kstep)
      s_t = dr._gather_stack(rcfg, replay, stream, kstep + 1)
      s = (s_tm1[::257, 0, 0, 0].astype(jnp.uint32).sum()
           + s_t[::257, 0, 0, 0].astype(jnp.uint32).sum())
      return jax.random.fold_in(k, s), ()
    key, _ = jax.lax.scan(body, key, None, length=reps)
    return key
  timeit("gather", lambda k: gather_n(k, replay), jax.random.PRNGKey(2),
         reps=reps)

  # --- fixed synthetic batch for compute sections ----------------------------
  bk = jax.random.PRNGKey(3)
  batch = dr.TransitionBatch(
      s_tm1=jax.random.randint(bk, (batch_size, 84, 84, 4), 0, 255,
                               jnp.int32).astype(jnp.uint8),
      a_tm1=jnp.zeros((batch_size,), jnp.int32),
      r_t=jnp.zeros((batch_size,), jnp.float32),
      discount_t=jnp.ones((batch_size,), jnp.float32),
      s_t=jax.random.randint(jax.random.fold_in(bk, 1),
                             (batch_size, 84, 84, 4), 0, 255,
                             jnp.int32).astype(jnp.uint8),
  )
  weights = jnp.ones((batch_size,), jnp.float32)

  # --- forward only ----------------------------------------------------------
  @jax.jit
  def forward_n(params, batch):
    def body(p, _):
      out = net.apply(p, jax.random.PRNGKey(0), batch.s_tm1)
      # tiny param perturbation keeps inputs changing without drift
      p = jax.tree_util.tree_map(
          lambda x: x + 1e-12 * out.q_values.sum().astype(x.dtype), p)
      return p, ()
    params, _ = jax.lax.scan(body, params, None, length=reps)
    return params
  timeit("forward", lambda p: forward_n(p, batch), online, reps=reps)

  # --- loss + grad ------------------------------------------------------------
  @jax.jit
  def lossgrad_n(params, batch):
    def loss_fn(p):
      out = spec.loss(spec, net, p, target, batch, weights,
                      jax.random.PRNGKey(0))
      return out.loss
    def body(p, _):
      loss, grads = jax.value_and_grad(loss_fn)(p)
      p = jax.tree_util.tree_map(lambda x, g: x - 1e-9 * g, p, grads)
      return p, ()
    params, _ = jax.lax.scan(body, params, None, length=reps)
    return params
  timeit("lossgrad", lambda p: lossgrad_n(p, batch), online, reps=reps)

  # --- optimizer update only ---------------------------------------------------
  grads = jax.tree_util.tree_map(lambda x: jnp.full_like(x, 1e-6), online)

  @jax.jit
  def update_n(carry, grads):
    import optax
    def body(c, _):
      p, o = c
      updates, o = eng.optimizer.update(grads, o)
      p = optax.apply_updates(p, updates)
      return (p, o), ()
    carry, _ = jax.lax.scan(body, carry, None, length=reps)
    return carry
  timeit("update", lambda c: update_n(c, grads), (online, opt_state),
         reps=reps)


if __name__ == "__main__":
  main()
