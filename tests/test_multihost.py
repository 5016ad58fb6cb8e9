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


@pytest.mark.timeout(600)
def test_two_process_training():
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
  for p in procs:
    out, _ = p.communicate(timeout=560)
    outs.append(out)
  for i, (p, out) in enumerate(zip(procs, outs)):
    assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
    assert "MULTIHOST_OK" in out, out[-2000:]
