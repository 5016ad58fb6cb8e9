"""Per-game cross-backend frame-activity dump (dev tool for the pixel
parity tests, VERDICT r4 weak #5).

For each game, rolls both backends — the JAX-native vector env (full
render → grayscale → 84x84 device prep) and the C++ farm (direct 84x84
render) — under the same scripted policy and prints coarse structural
stats: mean luma, fraction of temporally active pixels (std over time > 4),
and the bounding box of the active region. Used to pick the per-game
entity windows encoded in tests/test_pixel_parity.py.

Usage: PALLAS_AXON_POOL_IPS= python tools/frame_activity.py [game ...]
"""

import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def jax_rollout(name: str, steps: int = 120, batch: int = 2,
                seed: int = 0) -> np.ndarray:
  """(T, B, 84, 84) uint8 frames from the JAX backend's device prep path."""
  import jax.numpy as jnp
  from dqn_zoo_tpu.envs import api
  from dqn_zoo_tpu.envs.vector import VectorAtariEnv, VectorEnvConfig
  from dqn_zoo_tpu import prep

  game = api.get_game(name)
  env = VectorAtariEnv(game, batch, VectorEnvConfig(episode_frame_cap=100000))
  state = env.init(jax.random.PRNGKey(seed))

  @jax.jit
  def step(state, action):
    state, out = env.step(state, action)
    obs = prep.pooled_frame_to_84(out.frame_penult, out.frame_last, "fast")
    return state, obs

  rng = np.random.RandomState(seed)
  frames = []
  for t in range(steps):
    a = jnp.full((batch,), int(rng.randint(game.num_actions)), jnp.int32)
    state, obs = step(state, a)
    frames.append(np.asarray(obs))
  return np.stack(frames)


def cpp_rollout(name: str, steps: int = 120, batch: int = 2,
                seed: int = 0) -> np.ndarray:
  from dqn_zoo_tpu.envs.cpp_bridge import CppVectorEnv
  env = CppVectorEnv(name, batch_size=batch, seed=seed, num_threads=1,
                     episode_frame_cap=100000)
  rng = np.random.RandomState(seed)
  frames = []
  for t in range(steps):
    a = np.full(batch, rng.randint(env.num_actions), np.int32)
    out = env.step(a)
    frames.append(out.obs84.copy())
  env.close()
  return np.stack(frames)


def stats(frames: np.ndarray) -> dict:
  """frames: (T, B, 84, 84)."""
  f = frames.astype(np.float32)
  std = f.std(axis=0).max(axis=0)  # (84, 84) max-over-batch temporal std
  active = std > 4.0
  ys, xs = np.nonzero(active)
  bbox = ([int(ys.min()), int(ys.max()), int(xs.min()), int(xs.max())]
          if ys.size else None)
  return {
      "mean_luma": round(float(f.mean()), 1),
      "active_frac": round(float(active.mean()), 4),
      "active_bbox_y0y1x0x1": bbox,
      "row_profile": np.where(active.any(axis=1))[0].tolist(),
      "col_profile": np.where(active.any(axis=0))[0].tolist(),
  }


def main():
  from dqn_zoo_tpu.envs import api
  games = sys.argv[1:] or sorted(api.available_games())
  for g in games:
    try:
      j = stats(jax_rollout(g))
      c = stats(cpp_rollout(g))
      print(f"== {g}")
      for k in ("mean_luma", "active_frac", "active_bbox_y0y1x0x1"):
        print(f"  {k}: jax={j[k]}  cpp={c[k]}")
      jr, cr = set(j["row_profile"]), set(c["row_profile"])
      jc, cc = set(j["col_profile"]), set(c["col_profile"])
      iou_r = len(jr & cr) / max(1, len(jr | cr))
      iou_c = len(jc & cc) / max(1, len(jc | cc))
      print(f"  row-IoU={iou_r:.2f} col-IoU={iou_c:.2f}", flush=True)
    except Exception as e:
      print(f"== {g} FAILED: {e!r}", flush=True)


if __name__ == "__main__":
  main()
