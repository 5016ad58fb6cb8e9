"""Behavior tests for ms_pacman (strategy as tests/test_new_games.py)."""

import collections

import jax
import jax.numpy as jnp
import numpy as np

from dqn_zoo_tpu.envs import VectorAtariEnv, get_game
from dqn_zoo_tpu.envs.games import ms_pacman as mp


def test_maze_well_formed_and_connected():
  assert len(mp._MAZE) == mp.ROWS
  assert all(len(row) == mp.COLS for row in mp._MAZE)
  # BFS over corridor cells (with tunnel wrap): everything reachable, so no
  # pellet is stranded and ghosts can always move.
  start = mp._PLAYER_START
  seen = {start}
  q = collections.deque([start])
  while q:
    r, c = q.popleft()
    for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
      nr, nc = r + dr, (c + dc) % mp.COLS
      if 0 <= nr < mp.ROWS and not mp._WALL[nr][nc] and (nr, nc) not in seen:
        seen.add((nr, nc))
        q.append((nr, nc))
  corridor = {(r, c) for r in range(mp.ROWS) for c in range(mp.COLS)
              if not mp._WALL[r][c]}
  assert seen == corridor
  assert all(g in corridor for g in mp._GHOST_START)


def test_vector_smoke():
  env = VectorAtariEnv(get_game("ms_pacman"), batch_size=4)
  assert env.num_actions == 9
  state = env.init(jax.random.PRNGKey(0))
  step = jax.jit(env.step)
  key = jax.random.PRNGKey(1)
  frames = []
  for _ in range(12):
    key, k = jax.random.split(key)
    actions = jax.random.randint(k, (4,), 0, env.num_actions)
    state, out = step(state, actions)
    frames.append(np.asarray(out.frame_last))
  assert frames[-1].shape == (4, 210, 160, 3)
  assert not np.array_equal(frames[0], frames[-1])


def _clear_ghosts(state):
  """Park the ghosts inside the house so they can't interfere."""
  return state._replace(gr=jnp.full_like(state.gr, mp._GHOST_START[0][0]),
                        gc=jnp.full_like(state.gc, mp._GHOST_START[0][1]))


def test_pellet_and_power_rewards():
  state = _clear_ghosts(mp.ms_pacman_init(jax.random.PRNGKey(0)))
  # Player starts at 'P' (15, 9); the cell to its right (15, 10) is a pellet.
  assert bool(state.pellet[15, 10])
  s2, reward, done, _ = mp.ms_pacman_step(state, jnp.asarray(2))  # RIGHT
  assert float(reward) == mp.PELLET_POINTS
  assert not bool(s2.pellet[15, 10])
  assert not bool(done)
  # Re-entering the same cell scores nothing.
  s3 = s2._replace(pr=jnp.asarray(15, jnp.int32),
                   pc=jnp.asarray(9, jnp.int32), frame=jnp.asarray(2))
  _, reward, *_ = mp.ms_pacman_step(s3, jnp.asarray(2))
  assert float(reward) == 0.0
  # A power pellet sets the fright timer.
  sp = s2._replace(pr=jnp.asarray(15, jnp.int32),
                   pc=jnp.asarray(2, jnp.int32),
                   pdir=jnp.asarray(4, jnp.int32),
                   want=jnp.asarray(4, jnp.int32), frame=jnp.asarray(2))
  assert bool(sp.power[15, 1])
  s4, reward, *_ = mp.ms_pacman_step(sp, jnp.asarray(3))  # LEFT
  assert float(reward) == mp.POWER_POINTS
  assert int(s4.fright) == mp.POWER_FRAMES


def test_eating_frightened_ghost_scores_and_sends_home():
  state = mp.ms_pacman_init(jax.random.PRNGKey(0))
  state = _clear_ghosts(state)._replace(
      fright=jnp.asarray(mp.POWER_FRAMES, jnp.int32),
      gr=state.gr.at[0].set(15), gc=state.gc.at[0].set(10))
  s2, reward, done, life_lost = mp.ms_pacman_step(state, jnp.asarray(2))
  # Pellet (10) + first ghost (200).
  assert float(reward) == mp.PELLET_POINTS + mp.GHOST_POINTS
  assert int(s2.gr[0]) == mp._GHOST_START[0][0]
  assert not bool(life_lost) and not bool(done)
  assert int(s2.combo) == 1


def test_ghost_contact_costs_a_life_then_episode():
  state = _clear_ghosts(mp.ms_pacman_init(jax.random.PRNGKey(0)))
  state = state._replace(gr=state.gr.at[0].set(15), gc=state.gc.at[0].set(10))
  s2, reward, done, life_lost = mp.ms_pacman_step(state, jnp.asarray(2))
  assert bool(life_lost) and not bool(done)
  assert int(s2.lives) == mp.LIVES - 1
  assert int(s2.pr) == mp._PLAYER_START[0]  # reset to start
  # On the last life the episode ends instead.
  state = state._replace(lives=jnp.asarray(1, jnp.int32))
  _, _, done, life_lost = mp.ms_pacman_step(state, jnp.asarray(2))
  assert bool(done) and not bool(life_lost)


def test_walls_block_and_tunnel_wraps():
  state = _clear_ghosts(mp.ms_pacman_init(jax.random.PRNGKey(0)))
  # DOWN from the start cell is a wall row (16, 9): player must not move.
  s2, *_ = mp.ms_pacman_step(state, jnp.asarray(4))
  assert (int(s2.pr), int(s2.pc)) == mp._PLAYER_START
  # Tunnel: walking LEFT from (9, 0) wraps to column 18.
  st = state._replace(pr=jnp.asarray(9, jnp.int32),
                      pc=jnp.asarray(0, jnp.int32))
  s3, *_ = mp.ms_pacman_step(st, jnp.asarray(3))
  assert int(s3.pc) == mp.COLS - 1


def test_random_play_near_ale_anchor():
  """Random play eats some nearby pellets then dies (ALE random 307.3)."""
  env = VectorAtariEnv(get_game("ms_pacman"), batch_size=8)
  state = env.init(jax.random.PRNGKey(2))
  step = jax.jit(env.step)
  key = jax.random.PRNGKey(3)
  total = np.zeros((8,))
  ended = np.zeros((8,), bool)
  for _ in range(400):
    key, k = jax.random.split(key)
    actions = jax.random.randint(k, (8,), 0, env.num_actions)
    state, out = step(state, actions)
    total += np.asarray(out.raw_reward_sum) * ~ended
    ended |= np.asarray(out.is_last)
  mean = total.mean()
  assert 30.0 < mean < 2500.0
