"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip hardware is not available in CI; all sharding tests run on
``--xla_force_host_platform_device_count=8`` virtual CPU devices, and the real
TPU path is exercised by the driver's bench runs.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax (registering the TPU tunnel
# backend) before conftest runs, so the env var alone is too late — override
# the live config as well.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    """Function-scoped on purpose: a session-scoped generator makes every
    consumer's draws depend on which tests ran before it, so any subset run
    (-m "not slow", -k, a lone file) sees different numbers than the full
    pyramid — the round-3 advisor caught a tolerance-edge test flipping
    exactly this way.  Fresh seed-42 stream per test = order-independent."""
    return np.random.default_rng(42)
