"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU mesh so every sharding/collective test runs multi-device
without TPU hardware (the driver separately dry-run-compiles the multi-chip path). Must run
before the first ``import jax`` anywhere in the test process.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The hosting environment's sitecustomize may have force-registered a TPU platform plugin and
# overridden jax_platforms at import time; pin the test process back onto the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
