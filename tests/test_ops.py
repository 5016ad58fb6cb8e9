"""Loss-op tests: hand-computed values + gradient semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu import ops


def test_q_learning_td():
  q_tm1 = jnp.array([1.0, 2.0, 3.0])
  q_t = jnp.array([4.0, 1.0, 0.0])
  td = ops.q_learning(q_tm1, 1, 0.5, 0.9, q_t)
  # target = 0.5 + 0.9*4 = 4.1 ; td = 4.1 - 2 = 2.1
  np.testing.assert_allclose(td, 2.1, rtol=1e-6)


def test_double_q_learning_td():
  q_tm1 = jnp.array([1.0, 2.0, 3.0])
  q_t_value = jnp.array([0.0, 10.0, 1.0])
  q_t_selector = jnp.array([5.0, 1.0, 2.0])  # argmax 0 → evaluates to 0.0
  td = ops.double_q_learning(q_tm1, 2, 1.0, 0.5, q_t_value, q_t_selector)
  np.testing.assert_allclose(td, 1.0 + 0.5 * 0.0 - 3.0, rtol=1e-6)


def test_q_learning_target_not_differentiated():
  def loss(q_tm1, q_t):
    return ops.q_learning(q_tm1, 0, 0.0, 1.0, q_t) ** 2

  g = jax.grad(loss, argnums=1)(jnp.array([1.0, 0.0]), jnp.array([2.0, 0.0]))
  np.testing.assert_array_equal(g, jnp.zeros(2))


def test_clip_gradient():
  f = lambda x: jnp.sum(ops.l2_loss(ops.clip_gradient(x, -1.0, 1.0)))
  x = jnp.array([0.5, 3.0, -4.0])
  g = jax.grad(f)(x)
  # dL/dx = x, then clipped to ±1
  np.testing.assert_allclose(g, jnp.array([0.5, 1.0, -1.0]), rtol=1e-6)


def test_huber_loss_values():
  x = jnp.array([0.5, 2.0, -3.0])
  np.testing.assert_allclose(
      ops.huber_loss(x, 1.0), jnp.array([0.125, 1.5, 2.5]), rtol=1e-6)


def test_categorical_project_identity():
  z = jnp.linspace(-1.0, 1.0, 5)
  probs = jnp.array([0.1, 0.2, 0.4, 0.2, 0.1])
  out = ops.categorical_l2_project(z, probs, z)
  np.testing.assert_allclose(out, probs, atol=1e-6)


def test_categorical_project_shift_half_bin():
  z = jnp.array([0.0, 1.0, 2.0])
  probs = jnp.array([1.0, 0.0, 0.0])
  # shift the mass to 0.5: splits evenly between atoms 0 and 1
  out = ops.categorical_l2_project(jnp.array([0.5, 1.0, 2.0]), probs, z)
  np.testing.assert_allclose(out, jnp.array([0.5, 0.5, 0.0]), atol=1e-6)


def test_categorical_project_clips_out_of_range():
  z = jnp.array([0.0, 1.0])
  probs = jnp.array([0.3, 0.7])
  out = ops.categorical_l2_project(jnp.array([-5.0, 9.0]), probs, z)
  np.testing.assert_allclose(out, jnp.array([0.3, 0.7]), atol=1e-6)


def test_categorical_q_learning_zero_loss_when_target_matches():
  """If r=0, γ=1 and target dist equals online dist at greedy action, the
  cross-entropy equals the entropy of the target (minimal)."""
  atoms = jnp.array([0.0, 1.0])
  logits = jnp.log(jnp.array([[0.5, 0.5], [0.9, 0.1]]))
  loss = ops.categorical_q_learning(atoms, logits, 0, 0.0, 1.0, atoms, logits)
  # greedy a_t: q = [0.5, 0.1] → a_t=0; target = probs[0] = [.5,.5]
  # loss = -Σ target*log softmax(logits[0]) = entropy([.5,.5]) = log 2
  np.testing.assert_allclose(loss, np.log(2.0), rtol=1e-5)


def test_categorical_double_selects_with_selector():
  atoms = jnp.array([0.0, 1.0])
  logits_tm1 = jnp.log(jnp.array([[0.5, 0.5], [0.9, 0.1]]))
  logits_t = jnp.log(jnp.array([[1.0 - 1e-6, 1e-6], [1e-6, 1.0 - 1e-6]]))
  # selector says action 1 → target dist ~ delta at atom 1 → projected target
  # with r=0, γ=1 is [0, 1]
  loss = ops.categorical_double_q_learning(
      atoms, logits_tm1, 0, 0.0, 1.0, atoms, logits_t,
      jnp.array([0.0, 5.0]))
  np.testing.assert_allclose(loss, -np.log(0.5), rtol=1e-4)


def test_quantile_regression_loss_zero_when_equal_no_huber():
  dist = jnp.array([1.0, 2.0, 3.0])
  taus = jnp.array([1 / 6, 3 / 6, 5 / 6])
  loss = ops.quantile_regression_loss(dist, taus, dist, 0.0)
  # delta=0 on diagonal but cross terms nonzero; just check finiteness & sym
  assert np.isfinite(float(loss))


def test_quantile_q_learning_pessimism_direction():
  # Source quantiles all 0; target all 1 with r=0, γ=1 → positive loss that
  # decreases as source moves toward target.
  taus = jnp.array([0.25, 0.75])
  dist_tm1 = jnp.stack([jnp.array([0.0, 0.0]), jnp.array([5.0, 5.0])], axis=1)
  dist_t = jnp.stack([jnp.array([1.0, 1.0]), jnp.array([0.0, 0.0])], axis=1)
  loss0 = ops.quantile_q_learning(dist_tm1, taus, 0, 0.0, 1.0, dist_t, dist_t,
                                  1.0)
  dist_tm1_closer = dist_tm1.at[:, 0].set(jnp.array([0.9, 0.9]))
  loss1 = ops.quantile_q_learning(dist_tm1_closer, taus, 0, 0.0, 1.0, dist_t,
                                  dist_t, 1.0)
  assert float(loss1) < float(loss0)


def test_batch_variants_shapes():
  b, a, n = 4, 3, 5
  key = jax.random.PRNGKey(0)
  q = jax.random.normal(key, (b, a))
  acts = jnp.zeros((b,), jnp.int32)
  r = jnp.ones((b,))
  d = jnp.ones((b,))
  assert ops.batch_q_learning(q, acts, r, d, q).shape == (b,)
  assert ops.batch_double_q_learning(q, acts, r, d, q, q).shape == (b,)
  atoms = jnp.linspace(-1, 1, n)
  logits = jax.random.normal(key, (b, a, n))
  assert ops.batch_categorical_q_learning(
      atoms, logits, acts, r, d, atoms, logits).shape == (b,)
  assert ops.batch_categorical_double_q_learning(
      atoms, logits, acts, r, d, atoms, logits, q).shape == (b,)
  dist = jax.random.normal(key, (b, n, a))
  taus = jax.random.uniform(key, (b, n))
  assert ops.batch_quantile_q_learning(
      dist, taus, acts, r, d, dist, dist, 1.0).shape == (b,)


def test_epsilon_greedy_sample_distribution():
  key = jax.random.PRNGKey(0)
  q = jnp.array([[0.0, 5.0, 1.0]])
  n = 4000
  keys = jax.random.split(key, n)
  acts = jax.vmap(lambda k: ops.epsilon_greedy_sample(k, q, 0.3)[0])(keys)
  acts = np.asarray(acts)
  frac_greedy = np.mean(acts == 1)
  # P(greedy) = 1 - ε + ε/3 = 0.8
  assert abs(frac_greedy - 0.8) < 0.03
  assert set(np.unique(acts)) <= {0, 1, 2}


def test_epsilon_zero_is_greedy():
  key = jax.random.PRNGKey(0)
  q = jnp.array([[0.0, 5.0, 1.0], [9.0, 5.0, 1.0]])
  acts = ops.epsilon_greedy_sample(key, q, 0.0)
  np.testing.assert_array_equal(acts, jnp.array([1, 0]))


def test_linear_schedule():
  from dqn_zoo_tpu.utils import LinearSchedule
  s = LinearSchedule(begin_value=1.0, end_value=0.1, begin_t=10, end_t=110)
  np.testing.assert_allclose(s(0), 1.0)
  np.testing.assert_allclose(s(10), 1.0)
  np.testing.assert_allclose(s(60), 0.55, rtol=1e-6)
  np.testing.assert_allclose(s(110), 0.1, rtol=1e-6)
  np.testing.assert_allclose(s(500), 0.1, rtol=1e-6)
