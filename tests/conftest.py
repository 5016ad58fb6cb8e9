"""Test harness config: force CPU with 8 virtual devices.

The container's sitecustomize registers the axon TPU backend and sets
jax_platforms='axon,cpu', overriding the JAX_PLATFORMS env var — so we must
override the jax config AFTER import, before any backend initializes.
Multi-chip sharding paths are exercised on this virtual 8-device CPU mesh;
real TPU runs happen only via bench.py / the drivers.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
  os.environ["XLA_FLAGS"] = (
      _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
