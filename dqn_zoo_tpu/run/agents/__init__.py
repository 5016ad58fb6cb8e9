"""Per-agent CLI entry points: python -m dqn_zoo_tpu.run.agents.<agent>.

Mirrors the reference's per-agent runners (dqn_zoo/<agent>/run_atari.py);
each module presets --agent and defers to the shared driver.
"""
