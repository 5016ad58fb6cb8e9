"""Value-learning losses for DQN-family agents.

Reimplements, from the published algorithms, the exact loss surface the
reference consumes from rlax (see /root/reference/dqn_zoo/*/agent.py):

  * q_learning                      (DQN; Mnih et al. 2015)
  * double_q_learning               (van Hasselt et al. 2015)
  * categorical[_double]_q_learning (C51; Bellemare et al. 2017)
  * quantile_q_learning             (QR-DQN/IQN; Dabney et al. 2017/2018)
  * clip_gradient / l2_loss         (the reference's Huber-by-gradient-clip
                                     trick, ref dqn/agent.py:101-106)

Single-sample signatures mirror the rlax call sites so the agents read the
same; `batch_*` wrappers are the vmapped forms the reference builds with
`jax.vmap`. Everything is jit/vmap/grad-safe with static shapes only.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.custom_vjp
def clip_gradient(x, lo, hi):
  """Identity in the forward pass; clips the cotangent to [lo, hi] backward."""
  return x


def _clip_gradient_fwd(x, lo, hi):
  return x, (lo, hi)


def _clip_gradient_bwd(res, g):
  lo, hi = res
  return jnp.clip(g, lo, hi), None, None


clip_gradient.defvjp(_clip_gradient_fwd, _clip_gradient_bwd)


def l2_loss(x):
  return 0.5 * jnp.square(x)


def huber_loss(x, delta: float = 1.0):
  abs_x = jnp.abs(x)
  quadratic = jnp.minimum(abs_x, delta)
  linear = abs_x - quadratic
  return 0.5 * quadratic**2 + delta * linear


def q_learning(q_tm1, a_tm1, r_t, discount_t, q_t):
  """One-sample Q-learning TD error: r + γ·max_a q_t − q_tm1[a_tm1]."""
  target = r_t + discount_t * jnp.max(q_t)
  return jax.lax.stop_gradient(target) - q_tm1[a_tm1]


def double_q_learning(q_tm1, a_tm1, r_t, discount_t, q_t_value, q_t_selector):
  """Double Q TD error: online argmax selects, target evaluates."""
  a_t = jnp.argmax(q_t_selector)
  target = r_t + discount_t * q_t_value[a_t]
  return jax.lax.stop_gradient(target) - q_tm1[a_tm1]


def categorical_l2_project(z_p, probs, z_q):
  """Projects distribution (z_p, probs) onto support z_q (Cramér/L2).

  Standard C51 projection. z_q must be sorted and evenly usable; shapes:
  z_p (n,), probs (n,), z_q (m,) → (m,).
  """
  kq = z_q.shape[0]
  vmin, vmax = z_q[0], z_q[-1]
  d_pos = jnp.concatenate([z_q[1:] - z_q[:-1], jnp.ones((1,), z_q.dtype)])
  d_neg = jnp.concatenate([jnp.ones((1,), z_q.dtype), z_q[1:] - z_q[:-1]])
  z_p = jnp.clip(z_p, vmin, vmax)[None, :]  # (1, n)
  delta_qp = z_p - z_q[:, None]  # (m, n)
  d_sign = (delta_qp >= 0.0).astype(probs.dtype)
  delta_hat = (d_sign * delta_qp / d_pos[:, None]
               - (1.0 - d_sign) * delta_qp / d_neg[:, None])
  return jnp.sum(jnp.clip(1.0 - delta_hat, 0.0, 1.0) * probs[None, :], axis=1)


def categorical_q_learning(q_atoms_tm1, q_logits_tm1, a_tm1, r_t, discount_t,
                           q_atoms_t, q_logits_t):
  """C51 loss: cross-entropy to the projected greedy target distribution."""
  q_t_probs = jax.nn.softmax(q_logits_t)
  q_t = jnp.sum(q_t_probs * q_atoms_t[None, :], axis=1)
  a_t = jnp.argmax(q_t)
  return _categorical_loss(q_atoms_tm1, q_logits_tm1, a_tm1, r_t, discount_t,
                           q_atoms_t, q_t_probs, a_t)


def categorical_double_q_learning(q_atoms_tm1, q_logits_tm1, a_tm1, r_t,
                                  discount_t, q_atoms_t, q_logits_t,
                                  q_t_selector):
  """C51 loss with double-Q action selection from `q_t_selector` values."""
  a_t = jnp.argmax(q_t_selector)
  q_t_probs = jax.nn.softmax(q_logits_t)
  return _categorical_loss(q_atoms_tm1, q_logits_tm1, a_tm1, r_t, discount_t,
                           q_atoms_t, q_t_probs, a_t)


def _categorical_loss(q_atoms_tm1, q_logits_tm1, a_tm1, r_t, discount_t,
                      q_atoms_t, q_t_probs, a_t):
  target_z = r_t + discount_t * q_atoms_t
  target_probs = q_t_probs[a_t]
  target = categorical_l2_project(target_z, target_probs, q_atoms_tm1)
  logits_a = q_logits_tm1[a_tm1]
  return -jnp.sum(jax.lax.stop_gradient(target) * jax.nn.log_softmax(logits_a))


def quantile_regression_loss(dist_src, tau_src, dist_target,
                             huber_param: float = 0.0):
  """Quantile-regression (Huber) loss between quantile estimates.

  dist_src (n,) with quantile midpoints tau_src (n,); dist_target (m,).
  Returns sum over source quantiles of the mean over target samples.
  """
  dist_target = jax.lax.stop_gradient(dist_target)
  delta = dist_target[None, :] - dist_src[:, None]  # (n, m)
  indicator = (delta < 0.0).astype(delta.dtype)
  weight = jnp.abs(tau_src[:, None] - indicator)
  if huber_param == 0.0:
    delta_loss = jnp.abs(delta)
  else:
    delta_loss = huber_loss(delta, huber_param) / huber_param
  return jnp.sum(jnp.mean(weight * delta_loss, axis=-1))


def quantile_q_learning(dist_q_tm1, tau_q_tm1, a_tm1, r_t, discount_t,
                        dist_q_t_selector, dist_q_t, huber_param: float = 0.0):
  """Quantile-distribution Q-learning (QR-DQN / IQN).

  dist_* have shape (num_quantiles, num_actions); the selector distribution's
  mean picks the greedy next action, evaluated on `dist_q_t`.
  """
  dist_qa_tm1 = dist_q_tm1[:, a_tm1]
  q_t_selector = jnp.mean(dist_q_t_selector, axis=0)
  a_t = jnp.argmax(q_t_selector)
  dist_qa_t = dist_q_t[:, a_t]
  target = r_t + discount_t * dist_qa_t
  return quantile_regression_loss(dist_qa_tm1, tau_q_tm1, target, huber_param)


batch_q_learning = jax.vmap(q_learning)
batch_double_q_learning = jax.vmap(double_q_learning)
batch_categorical_q_learning = jax.vmap(
    categorical_q_learning, in_axes=(None, 0, 0, 0, 0, None, 0))
batch_categorical_double_q_learning = jax.vmap(
    categorical_double_q_learning, in_axes=(None, 0, 0, 0, 0, None, 0, 0))
batch_quantile_q_learning = jax.vmap(
    quantile_q_learning, in_axes=(0, 0, 0, 0, 0, 0, 0, None))
