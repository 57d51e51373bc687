"""Test harness: force an 8-device virtual CPU backend.

Tests never require TPU hardware: kernels are exercised on CPU, and the
mesh/sharding path runs on 8 virtual host devices (the standard JAX
fake-backend trick; SURVEY.md section 4 implication (d)).

The axon TPU environment pins ``JAX_PLATFORMS=axon`` via sitecustomize,
so the env var alone is not enough -- ``jax.config.update`` after import
(but before first backend use) wins.
"""

import os
import sys
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
