"""Tests for the run/ layer: writers, trackers, atari_data, plot, checkpoint."""

import csv
import os

import numpy as np
import pytest

from dqn_zoo_tpu.run import atari_data
from dqn_zoo_tpu.run.trackers import EpisodeTracker, StepRateTracker
from dqn_zoo_tpu.run.writers import CsvWriter, NullWriter


def test_atari_data_57_games_monotone():
  assert len(atari_data.ATARI_GAMES) == 57
  for game in atari_data.ATARI_GAMES:
    # human beats random on every game (ref atari_data_test.py)
    assert atari_data.get_human_normalized_score(game, 1e9) > 0
    r = atari_data.get_human_normalized_score(game, -1e9)
    assert r < 0
  np.testing.assert_allclose(
      atari_data.get_human_normalized_score("pong", 14.6), 1.0)
  np.testing.assert_allclose(
      atari_data.get_human_normalized_score("pong", -20.7), 0.0)
  assert np.isnan(atari_data.get_human_normalized_score("catch", 1.0))


def test_csv_writer_header_once_and_resume(tmp_path):
  path = str(tmp_path / "r.csv")
  w = CsvWriter(path)
  w.write({"a": 1, "b": 2})
  w.write({"a": 3, "b": 4})
  state = w.get_state()
  # resume with a fresh writer restored from state: no duplicate header
  w2 = CsvWriter(path)
  w2.set_state(state)
  w2.write({"a": 5, "b": 6})
  with open(path) as f:
    rows = list(csv.reader(f))
  assert rows[0] == ["a", "b"]
  assert len(rows) == 4
  assert rows[3] == ["5", "6"]


def test_csv_writer_truncates_rows_past_state(tmp_path):
  """A death between writer.write(row_i) and the checkpoint save leaves the
  file one row ahead of the restored state; set_state truncates back so the
  resumed iteration's re-write is not a duplicate (round-4 advisor
  finding)."""
  path = str(tmp_path / "r.csv")
  w = CsvWriter(path)
  w.write({"a": 1, "b": 2})
  state = w.get_state()  # snapshot BEFORE the doomed row
  w.write({"a": 3, "b": 4})  # written, but never reached a checkpoint
  w2 = CsvWriter(path)
  w2.set_state(state)
  w2.write({"a": 30, "b": 40})  # resumed run re-emits iteration 1's row
  with open(path) as f:
    rows = list(csv.reader(f))
  assert rows == [["a", "b"], ["1", "2"], ["30", "40"]]
  # Legacy state without the counter: no truncation (backward compatible).
  w3 = CsvWriter(path)
  w3.set_state({"header_written": True, "fieldnames": ["a", "b"]})
  w3.write({"a": 5, "b": 6})
  with open(path) as f:
    assert len(list(csv.reader(f))) == 4


def test_csv_writer_rejects_field_change(tmp_path):
  w = CsvWriter(str(tmp_path / "r.csv"))
  w.write({"a": 1})
  with pytest.raises(ValueError):
    w.write({"b": 2})


def test_null_writer_noop():
  w = NullWriter()
  w.write({"x": 1})
  w.set_state(w.get_state())


def test_episode_tracker():
  t = EpisodeTracker()
  assert np.isnan(t.get()["episode_return"])
  t.update(episodes=2, return_sum=30.0, frames=100)
  t.update(episodes=1, return_sum=0.0, frames=50)
  g = t.get()
  assert g["episode_return"] == 10.0
  assert g["num_episodes"] == 3
  assert g["frame_count"] == 150
  t.reset()
  assert t.get()["num_episodes"] == 0


def test_step_rate_tracker():
  t = StepRateTracker()
  t.update(0)
  t.update(1000)
  g = t.get()
  assert g["step_rate"] > 0


def test_plot_writes_svg(tmp_path):
  path = str(tmp_path / "results.csv")
  with open(path, "w") as f:
    wr = csv.DictWriter(f, fieldnames=["frame", "eval_episode_return"])
    wr.writeheader()
    for i in range(5):
      wr.writerow({"frame": i * 1000, "eval_episode_return": i * 0.1})
  out = str(tmp_path / "out.svg")
  from dqn_zoo_tpu.run import plot
  assert plot.main(["--csv", path, "--labels", "x", "--out", out]) == 0
  assert os.path.exists(out)
  assert open(out).read().startswith("<?xml")


def test_plot_summary_median_across_games(tmp_path):
  """Summary mode: median capped-normalized return per agent across its
  games (the plot_atari_summary.svg analogue, ref README.md:28-30)."""
  paths = []
  for g, vals in (("a", [0.0, 0.2, 0.6]), ("b", [0.0, 0.4, 1.0])):
    path = str(tmp_path / f"{g}.csv")
    with open(path, "w") as f:
      wr = csv.DictWriter(f, fieldnames=["frame",
                                         "capped_normalized_return"])
      wr.writeheader()
      for i, v in enumerate(vals):
        wr.writerow({"frame": i * 1000, "capped_normalized_return": v})
    paths.append(path)
  out = str(tmp_path / "summary.svg")
  from dqn_zoo_tpu.run import plot
  assert plot.main(["--summary", "--csv", paths[0], "--csv", paths[1],
                    "--labels", "agent,agent", "--out", out]) == 0
  assert open(out).read().startswith("<?xml")
