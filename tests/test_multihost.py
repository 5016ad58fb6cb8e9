"""Simulated multi-host training test: N processes × M CPU devices.

The reference has nothing distributed to test (SURVEY.md §2.6); this
exercises the full jax.distributed + shard_map path the multi-host TPU
deployment uses.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
  s = socket.socket()
  s.bind(("localhost", 0))
  port = s.getsockname()[1]
  s.close()
  return port


def test_two_process_training():
  # Hang guard is manual (pytest-timeout isn't installed, so a
  # @pytest.mark.timeout would be silently inert): communicate(timeout=)
  # bounds each wait, and the finally-kill reaps both workers so a hung
  # rendezvous can neither stall the suite past ~9.5 min nor leak
  # processes that keep the distributed port busy for later tests.
  port = _free_port()
  worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
  env = dict(os.environ)
  env["PYTHONPATH"] = os.pathsep.join(
      [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
      + env.get("PYTHONPATH", "").split(os.pathsep))
  procs = [
      subprocess.Popen([sys.executable, worker, str(i), "2", str(port)],
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       env=env, text=True)
      for i in range(2)
  ]
  outs = []
  try:
    for p in procs:
      out, _ = p.communicate(timeout=560)
      outs.append(out)
  finally:
    for p in procs:
      if p.poll() is None:
        p.kill()
        p.communicate()
  for i, (p, out) in enumerate(zip(procs, outs)):
    assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
    assert "MULTIHOST_OK" in out, out[-2000:]
